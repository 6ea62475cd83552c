package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `Tables.events` must read BOTH physical generations of `events.ts` —
  * the testdata generator has shipped TIMESTAMP(NANOS) (loaded as a long
  * under legacy nanosAsLong) and plain TIMESTAMP(MICROS) across rounds,
  * and a generator flip silently broke every events query once (round 9).
  * These specs pin the dispatch so the next flip fails HERE. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val micros = 1700000000123456L // µs-precision instant

  test("events.ts nanos-as-long generation converts losslessly to µs") {
    val dir = tmpDir("tables_nanos")
    Seq((1L, micros * 1000L, 7L, "click", 1.5, "p"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros($"ts")).as[Long].head() == micros)
  }

  test("events.ts GENUINE TIMESTAMP(NANOS) parquet loads via nanosAsLong") {
    // The synthetic write above pins the BIGINT branch; this one pins the
    // actual legacy read path: a checked-in parquet whose ts column is
    // physically annotated Timestamp(NANOS) (written by pyarrow with
    // coerce_timestamps=None, format 2.6), which Spark surfaces as
    // LongType only under spark.sql.legacy.parquet.nanosAsLong=true. If a
    // Spark upgrade changes that reader behavior, this fails first.
    val dir = new java.io.File(
      getClass.getResource("/events_nanos/events.parquet").toURI).getParent
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros($"ts")).as[Long].head() == micros)
  }

  test("events.ts micros-timestamp generation passes through unchanged") {
    val dir = tmpDir("tables_micros")
    Seq((1L, micros, 7L, "click", 1.5, "p"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros($"ts")).as[Long].head() == micros)
  }

  test("events.ts of an unexpected physical type fails loudly") {
    val dir = tmpDir("tables_bad")
    Seq((1L, "not-a-timestamp", 7L, "click", 1.5, "p"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("unexpected events.ts type"))
  }
}
