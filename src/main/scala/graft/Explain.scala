package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan of named queries (all of them with
  * no args). Usage: `runMain graft.Explain [sfDir] [q...]`.
  * This is how the partition/shuffle/pushdown audit happens — a query is
  * not done until its plan is the one you'd ship at 100 TB.
  *
  * `SPARK_GRAFT_EXPLAIN_DIR`: also write each query's FULL
  * `explain("formatted")` output to `<dir>/<query>.txt` — the committed
  * `plans/rNN/` audit artifacts the optimization rounds diff.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val known = SparkEntry.queries.keySet
    // `Explain q61_sessionize` (no sfDir) must not silently treat the query
    // name as a data dir and explain everything against a missing path
    val (sfDir, rest) = args.headOption match {
      case Some(a) if known.contains(a) => ("/root/testdata/sf0.001", args.toSeq)
      case Some(a) => (a, args.tail.toSeq)
      case None => ("/root/testdata/sf0.001", Nil)
    }
    val bad = rest.filterNot(known.contains)
    require(bad.isEmpty,
      s"unknown queries: ${bad.mkString(", ")}; valid: ${known.toSeq.sorted.mkString(", ")}")
    val names = if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
    val spark = EngineConf.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    outDir.foreach(d => new java.io.File(d).mkdirs())
    // LIMITATION (stated in every dumped artifact): this prints the
    // PRE-EXECUTION plan (`AdaptiveSparkPlan isFinalPlan=false`), not
    // AQE's final runtime plan — AQE-applied changes (post-shuffle
    // coalescing, runtime join-strategy rewrites, skew splits) are not
    // visible here. Runtime AQE hazards on the write paths are guarded
    // in code instead (explicit repartition counts — Clustering.writePar)
    // and measured via ProfileQuery job counts, not via these dumps.
    val header =
      "-- NOTE: pre-execution plan (AQE initial, isFinalPlan=false).\n" +
      "-- AQE runtime rewrites (partition coalescing, join strategy\n" +
      "-- changes, skew splits) are NOT shown; write-path AQE behavior\n" +
      "-- is pinned in code (Clustering.writePar) and job-count profiles.\n"
    names.foreach { q =>
      println(s"\n========== $q ==========")
      val df = SparkEntry.queries(q)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(formatted.take(4000))
      outDir.foreach { d =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/$q.txt"), header + formatted)
      }
      graft.operators.OperatorCaches.releaseAll()
    }
    spark.stop()
  }
}
