package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish test tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] takes `(spark, sfDir)` and reads
  * only these tables, so the driver can point the same query at any scale
  * factor. At 100 TB the same code path applies: `spark.read.parquet` on a
  * partitioned table directory — Catalyst handles partition pruning,
  * predicate pushdown and column pruning from there.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical forms across testdata
    * generations: Parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader only loads as a long, via legacy nanosAsLong) and plain
    * TIMESTAMP(MICROS). Normalize BOTH to a session-TZ µs timestamp —
    * exactly what DuckDB surfaces for either physical type, so the two
    * engines always see identical values. (The nanos data is µs-precision
    * with trailing 000, so the truncation is lossless.)
    *
    * For nanos-form data, `spark.sql.legacy.parquet.nanosAsLong=true` must
    * be set AT SESSION CONSTRUCTION (Verify/Bench/Tool/test fixtures all
    * do); there is no per-read parquet option for it, and mutating session
    * conf at plan-build time would leak the setting into unrelated reads.
    * The µs form needs no conf — dispatch is on the loaded dtype, not on
    * the conf, so a session without the flag still reads µs-form data.
    *
    * The NTZ→TZ cast below is an identity: every entrypoint pins
    * `spark.sql.session.timeZone=UTC`, and casting re-tags the micros
    * value without rebasing it there. TZ-typed ts keeps q16-style
    * comparisons against `lit(...).cast(TimestampType)` well-typed. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>           // nanos-as-long generation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => // µs generation, NTZ physical type
        // the NTZ→TZ cast is an identity ONLY under a UTC session zone —
        // any other zone silently SHIFTS every instant instead of
        // re-tagging it; fail loudly like the old nanosAsLong guard did.
        // Zone EQUIVALENCE, not string equality: "Etc/UTC", "GMT", and
        // "+00:00" all make the cast an identity too.
        val zone = s.conf.get("spark.sql.session.timeZone")
        val isUtc = scala.util.Try(
          java.time.ZoneId.of(zone).normalized() == java.time.ZoneOffset.UTC
        ).getOrElse(false)
        require(isUtc,
          "events.ts is TIMESTAMP_NTZ: the NTZ->TZ cast is only an " +
            "identity under a UTC-equivalent session zone, but the " +
            s"session zone is $zone")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType =>    // µs generation, already zone-tagged
        raw
      case other =>
        throw new IllegalStateException(
          s"unexpected events.ts type $other — expected nanos-as-long " +
            "(with spark.sql.legacy.parquet.nanosAsLong=true) or a " +
            "timestamp type")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
