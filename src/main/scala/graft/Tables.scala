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
  /** `events.ts` is written as Parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read it as a long (legacy nanosAsLong) and
    * truncate to microseconds — exactly what DuckDB does when it surfaces the
    * column as TIMESTAMP (µs), so both engines see identical values. The
    * underlying data is µs-precision (trailing 000 ns), so this is lossless.
    *
    * `spark.sql.legacy.parquet.nanosAsLong=true` must be set on the session
    * AT CONSTRUCTION (Verify/Bench/Tool/test fixtures all do); there is no
    * per-read parquet option for it, and mutating session conf at plan-build
    * time would leak the setting into unrelated reads.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "Tables.events requires spark.sql.legacy.parquet.nanosAsLong=true " +
        "set at session construction")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
