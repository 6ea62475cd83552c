package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev microbenchmark for the FIXED-INDEX serve slope of the CDC chunk
  * screen: how does `Dedup.incrementalCdcMatches` cost scale with the
  * DELTA size when the persisted index does not change? The per-round
  * bench corpora scale index and delta together (q152's delta is always
  * corpus/10), which conflates the two axes; the operational question —
  * "this week's crawl doubled, what happens to the screen?" — needs the
  * index pinned.
  *
  * Protocol: build the chunk index ONCE on the base corpus, persist and
  * reload it (the serve path a cron actually runs), then screen two
  * delta corpora of different sizes against the SAME loaded index,
  * min-of-2 passes each. The expected shape is delta-linear: one
  * boundary-kernel scan of the delta, one hash equi-join into the index
  * (the index side shuffles once per serve — index-proportional but
  * scan-cheap), one per-doc agg. Prints one JSON line; recorded in
  * BASELINE.md.
  *
  * Usage:
  *   SPARK_GRAFT_CDC_BASE=/tmp/x25 SPARK_GRAFT_CDC_D1=/root/testdata/sf0.1 \
  *   SPARK_GRAFT_CDC_D10=/tmp/x10 sbt "runMain graft.ServeScaleBench"
  */
object ServeScaleBench {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_CDC_BASE", "/tmp/x25")
    val d1 = sys.env.getOrElse("SPARK_GRAFT_CDC_D1", "/root/testdata/sf0.1")
    val d10 = sys.env.getOrElse("SPARK_GRAFT_CDC_D10", "/tmp/x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .appName("graft-serve-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs(dir: String): DataFrame =
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
    val mask = 32
    val idxPath = s"/tmp/servescale_cdc_idx_${System.nanoTime()}"
    val tBuild = System.nanoTime()
    graft.operators.Dedup.saveCdcIndex(
      graft.operators.Dedup.buildCdcIndex(docs(base), "doc_id", "text", mask),
      idxPath)
    val buildSec = (System.nanoTime() - tBuild) / 1e9
    val idx = graft.operators.Dedup.loadCdcIndex(spark, idxPath)
    def serveSec(deltaDir: String): (Double, Long, Long) = {
      def once(): (Double, Long, Long) = {
        val t0 = System.nanoTime()
        val r = graft.operators.Dedup.incrementalCdcMatches(
            docs(deltaDir), idx, "doc_id", "text", mask)
          .agg(count(lit(1)).as("n"), sum(col("n_dup_chunks")).as("dups"))
          .head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0),
          Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
      }
      val a = once(); val b = once()
      (math.min(a._1, b._1), a._2, a._3)
    }
    val (s1, n1, _) = serveSec(d1)
    val (s10, n10, _) = serveSec(d10)
    println(s"""{"metric":"cdc_serve_fixed_index","build_sec":$buildSec,""" +
      s""""delta1_docs":$n1,"delta1_sec":$s1,""" +
      s""""delta10_docs":$n10,"delta10_sec":$s10,""" +
      s""""slope":${s10 / math.max(s1, 1e-9)}}""")
    spark.stop()
  }
}
