package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** HFile-bulk-load analog: totally ordered, range-partitioned staged write
  * plus an atomic commit.
  *
  * Reference mapping:
  *  - `TotalOrderPartitioner` with one partition per target region
  *    (`KM/output/HFileMapReduceJobOutput.java:147-167, 253-278`) →
  *    `repartitionByRange(n, keyCols)` (Spark samples range boundaries the
  *    way the reference samples region splits).
  *  - identity-reduce shuffle sort (`KM/reducer/IdentityReducer.java:54-76`)
  *    → `sortWithinPartitions` — the shuffle IS the sort.
  *  - ≤256 MB rolling files that never split a row
  *    (`KM/output/framework/KijiHFileOutputFormat.java:190-216`) →
  *    `maxRecordsPerFile` (Spark also never splits a row across files).
  *  - `HFileLoader.load` atomic hand-off (`KM/HFileLoader.java:73-75`,
  *    `KM/tools/KijiBulkLoad.java:156-163`) → staged directory + atomic
  *    rename swap into the final location.
  *
  * Idempotence: the staged directory is unique per attempt; the commit is a
  * single FileSystem.rename (atomic on HDFS and local fs). A re-run after
  * any failure before commit leaves the destination untouched; a re-run
  * after commit replaces the table wholesale (same effect as re-bulk-load).
  */
object BulkSink {

  def bulkLoad(df: DataFrame, dest: String, numPartitions: Int,
               keyCols: Seq[String], sortCols: Seq[Column],
               maxRecordsPerFile: Long = 0L,
               extraFiles: Map[String, String] = Map.empty): Unit = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(numPartitions, keyCols.map(col): _*)
      .sortWithinPartitions(sortCols: _*)
    val staging = s"$dest.__staging_${java.util.UUID.randomUUID().toString.take(8)}"
    val writer = sorted.write.mode("overwrite")
    (if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer).parquet(staging)
    writeExtraFiles(spark, staging, extraFiles)
    commit(spark, staging, dest)
  }

  /** Small metadata files (e.g. the `_asof_watermark` history barrier)
    * written INTO the staging dir so the commit rename promotes data and
    * markers in one atomic step — a marker written after the commit
    * leaves a crash window in which the data is live but the marker is
    * lost (exactly the silent state the marker exists to prevent). */
  def writeExtraFiles(spark: SparkSession, staging: String,
                      extraFiles: Map[String, String]): Unit =
    if (extraFiles.nonEmpty) {
      val fs = new Path(staging)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      extraFiles.foreach { case (name, content) =>
        val out = fs.create(new Path(staging, name), true)
        try out.write(content.getBytes("UTF-8")) finally out.close()
      }
    }

  /** Atomic swap of `staging` into `dest` (+ cleanup of the replaced data).
    * Mirrors the bulk-load hand-off: writers never touch the live location. */
  def commit(spark: SparkSession, staging: String, dest: String): Unit = {
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(dest + ".__replaced")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(destPath)) {
      if (!fs.rename(destPath, old))
        throw new java.io.IOException(s"bulk commit: cannot displace $dest")
    }
    // Promotion may FAIL by returning false or by throwing (fs-dependent,
    // e.g. FileNotFoundException for a lost staging dir); either way the
    // displaced table must be restored so the live location never
    // disappears.
    val promoted =
      try fs.rename(new Path(staging), destPath)
      catch { case e: java.io.IOException =>
        if (fs.exists(old)) fs.rename(old, destPath)
        throw e
      }
    if (!promoted) {
      if (fs.exists(old)) fs.rename(old, destPath)
      throw new java.io.IOException(s"bulk commit: cannot promote $staging")
    }
    if (fs.exists(old)) fs.delete(old, true)
  }
}
