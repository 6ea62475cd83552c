package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line the driver parses.
  *
  * Each query is executed through the `noop` sink (not `.count()`): count()
  * lets Catalyst prune projections and eliminate sorts under the aggregate,
  * which would skip exactly the work being measured. The noop sink fully
  * materializes every output row/column on the executors with zero IO cost.
  * Failures are reported (negative duration + stderr), never swallowed.
  *
  * Noise control: the full query list runs TWICE and each query reports its
  * minimum — the write-roundtrip queries (temp-table staging) swing 2-4x
  * with host disk throttling, and min-of-2 measures the code, not the virtio
  * layer. Log level is ERROR: log4j WARNs that carry stack traces (e.g. the
  * benign FileStreamSink metadata probe on glob reads) would otherwise leak
  * frames into stderr and mask real failures; Bench's own failure reports
  * print directly to stderr and are unaffected.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the JVM (codegen compiler, parquet reader, shuffle paths) so the
    // alphabetically-first query doesn't absorb ~5s of one-time startup.
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    // Also warm the decimal hash-agg codegen path and the big-table scan:
    // q01 (alphabetically first) otherwise pays both one-time costs in BOTH
    // passes (pass 2 runs after 50+ queries have evicted its compiled
    // code), reporting JIT startup instead of steady-state query speed.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast(DecimalType(30, 2))))
        .write.format("noop").mode("overwrite").save()
    }
    // One timed standalone execution: + seconds on success, - on failure.
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop cached frames a query persisted (LSH signatures): each query
      // must be timed standalone, not against another query's leftovers.
      graft.operators.OperatorCaches.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      if (ok) dt else -dt
    }
    // Dev knob: SPARK_GRAFT_ONLY=q64_repetition,q68_pack_shards times a
    // subset (absent = the full driver contract).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val bad = names.diff(SparkEntry.queries.keySet)
      require(bad.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${bad.mkString(", ")} " +
          "(a typo would otherwise benchmark nothing and print total=0)")
    }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
    val passes = Seq.fill(2)(queries.map { case (name, fn) => timeOne(name, fn) })
    val results = queries.map(_._1).zipWithIndex.map { case (name, i) =>
      val runs = passes.map(_(i))
      val good = runs.filter(_ >= 0)
      // min over successful runs; negative (failure) only if every run failed
      name -> (if (good.nonEmpty) good.min else -runs.map(-_).min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2.abs).sum
    // System load snapshot: distinguishes a real regression from a noisy
    // shared box (uniform inflation across trivial queries + high loadavg
    // = contention, not code).
    val loadavg = try {
      java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split("\\s+").take(3).mkString(",")
    } catch { case _: Throwable => "" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":2,"loadavg":"$loadavg"}""")
    spark.stop()
  }
}
