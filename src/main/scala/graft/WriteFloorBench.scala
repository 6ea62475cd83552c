package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement (guide §1): the fixed cost of the engine's artifact
  * write shapes on this host — 1-file codebook writes, 32-task surface
  * writes, 256-dir partitioned stagings — isolated from any query
  * logic, warm (5 reps each, min reported). Run:
  * `runMain graft.WriteFloorBench`. */
object WriteFloorBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = EngineConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
    // SPARK_GRAFT_RAWFS=1: quantify the .crc sidecar cost (see EngineConf)
    val spark = (if (sys.env.contains("SPARK_GRAFT_RAWFS"))
      b0.config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
    else b0).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("wfloor").toString
    val one = Seq(1).toDF("v")
    val corpus = spark.range(2000)
      .select(col("id").as("n_id"),
        pmod(col("id"), lit(4L)).cast("int").as("shard"),
        pmod(xxhash64(col("id")), lit(64L)).as("c_id"),
        col("id").as("x"))
      .persist()
    corpus.count()
    def t(name: String)(body: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s min ${ts.min}%6.3f s  (all: ${ts.map(x => f"$x%.3f").mkString(", ")})")
    }
    t("coalesce1-1row") {
      one.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/a")
    }
    t("plain-32task-2000rows") {
      corpus.repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$base/b")
    }
    t("partitionBy-shard (4 dirs)") {
      corpus.repartition(32, col("shard")).write.mode(SaveMode.Overwrite)
        .partitionBy("shard").parquet(s"$base/c")
    }
    t("partitionBy-shard,c_id (256 dirs)") {
      corpus.repartition(32, col("shard"), col("c_id"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("shard", "c_id").parquet(s"$base/d")
    }
    t("noop-32task") {
      corpus.repartition(32).write.format("noop").mode(SaveMode.Overwrite).save()
    }
    spark.stop()
  }
}
