package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff of two keyed corpus snapshots — the data-ops answer to
  * "what changed between yesterday's crawl and today's?": every key is
  * classified `added` / `removed` / `changed` / `unchanged` by comparing
  * content fingerprints across a full-outer join on the key.
  *
  * The reference's nearest surface is re-running a whole gatherer job and
  * eyeballing counters (KM/framework/JobHistoryKijiTable.java records only
  * job-level counts); a keyed diff is what an incremental-ingestion
  * pipeline actually consumes — the `added`+`changed` set IS the next
  * incremental-dedup batch (q79), and `removed` drives retention deletes.
  *
  * Scale shape: ONE full-outer sort-merge join on the key (each side
  * shuffles once; co-partitioned if both snapshots are bucketed by key,
  * which the bulk sink's range partitioning already provides), then a
  * bounded per-status aggregation. Fingerprints travel as fixed-width
  * strings — content never shuffles twice.
  */
object SnapshotDiff {

  /** Per-key status frame: (key, group, status, old_fp, new_fp) with
    * `status` ∈ added | removed | changed | unchanged. Inputs are
    * (key, group, fp) frames — `group` is any carry-along dimension for
    * downstream rollups (source, shard, ...); fingerprints must be
    * non-null. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
           groupCol: String, fpCol: String): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("__k"), col(groupCol).as("__go"),
      col(fpCol).as("old_fp"))
    val n = newSnap.select(col(keyCol).as("__k"), col(groupCol).as("__gn"),
      col(fpCol).as("new_fp"))
    o.join(n, Seq("__k"), "full_outer")
      .select(col("__k").as(keyCol),
        coalesce(col("__go"), col("__gn")).as(groupCol),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged").as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Rolled-up diff scorecard: (group, status, n). */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
                  groupCol: String, fpCol: String): DataFrame =
    diff(oldSnap, newSnap, keyCol, groupCol, fpCol)
      .groupBy(col(groupCol), col("status"))
      .agg(count(lit(1)).as("n"))
}
