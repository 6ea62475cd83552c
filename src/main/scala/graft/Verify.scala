package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  import org.apache.spark.sql.types._

  /** Downstream checkers compare results via pandas; ARRAY/MAP/STRUCT
    * columns are unhashable there and silently void the verification.
    * Every declared query must emit scalar columns only — fail fast so
    * the local gate catches a complex-typed output before the driver. */
  def requireScalarSchema(name: String, schema: StructType): Unit = {
    val complex = schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType] ||
                f.dataType.isInstanceOf[StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }
    require(complex.isEmpty,
      s"query $name emits non-scalar output column(s) ${complex.mkString(", ")}" +
        " — pandas-based checkers cannot hash these; unnest or fingerprint them")
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = EngineConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev knob mirroring Bench's: SPARK_GRAFT_ONLY=q94_ivfpq_search,...
    // verifies a subset (both the result dumps and the emitted oracle
    // json, so scripts/check.py sees a consistent pair). The driver never
    // sets it — the full contract is the default.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val bad = names.diff(SparkEntry.queries.keySet)
      require(bad.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: ${bad.mkString(", ")}")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // repartition(1) (not coalesce): single output file for the driver,
      // but upstream stages keep their parallelism — coalesce(1) would
      // collapse the whole query into one task.
      try {
        val df = fn(spark, sfDir)
        requireScalarSchema(name, df.schema)
        df.repartition(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Release per-query operator caches (LSH signatures etc.) so 45+
      // sequential queries don't accumulate executor storage in one JVM.
      graft.operators.OperatorCaches.releaseAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
