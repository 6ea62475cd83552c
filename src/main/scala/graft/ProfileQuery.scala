package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev measurement tool (guide §1): run named queries exactly as Bench
  * does (noop sink, same session knobs) while a listener attributes
  * every Spark job's wall time to its call site. Prints, per query:
  * total seconds, job count, and the top call sites by summed job time
  * — the decomposition that says WHERE a 19 s lifecycle query spends
  * its seconds (train? staging write? commit metadata? serve?).
  * Gaps between jobs (driver-side planning/filesystem work) show up as
  * `total - Σjobs`, reported as `driver/planning gap`.
  *
  * Usage: `runMain graft.ProfileQuery [sfDir] q194_ivfpq_sharded_rebuild ...`
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val known = SparkEntry.queries.keySet
    val (sfDir, rest) = args.headOption match {
      case Some(a) if known.contains(a) => ("/root/testdata/sf0.1", args.toSeq)
      case Some(a) => (a, args.tail.toSeq)
      case None => ("/root/testdata/sf0.1", Nil)
    }
    val bad = rest.filterNot(known.contains)
    require(rest.nonEmpty && bad.isEmpty,
      s"usage: ProfileQuery [sfDir] <query>...; unknown: ${bad.mkString(", ")}")
    // report accumulates here AND to a file (sbt shell has no redirect)
    val report = new StringBuilder
    def out(s: String): Unit = { println(s); report.append(s).append('\n'); () }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm like Bench does
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()

    // job-id -> (callSite, startNs); synchronized — listener runs on its bus
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // job description (set by concurrentFrames with its caller) wins;
        // else the result stage's name = the action's call site short form
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(j.stageInfos.lastOption.map(_.name)).getOrElse("?")
        starts.put(j.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (site, t0) =>
          done.add((site, (System.nanoTime() - t0) / 1e9))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    rest.foreach { name =>
      done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      graft.operators.OperatorCaches.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      // give the listener bus a moment to drain before reading `done`
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val jobs = done.asScala.toSeq
      val jobSum = jobs.map(_._2).sum
      out(f"\n===== $name: total $total%.2f s, ${jobs.size} jobs, " +
        f"jobs $jobSum%.2f s, driver/planning gap ${total - jobSum}%.2f s =====")
      jobs.groupBy(_._1).view
        .mapValues(v => (v.size, v.map(_._2).sum)).toSeq
        .sortBy(-_._2._2).take(40)
        .foreach { case (site, (n, secs)) =>
          out(f"  $secs%7.2f s  n=$n%-4d $site")
        }
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/graft_profile.txt"), report.toString)
    spark.stop()
  }
}
