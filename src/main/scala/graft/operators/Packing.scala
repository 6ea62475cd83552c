package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: assign ordered documents to fixed-budget
  * training shards ("pack docs into ~N-token files"). A document's shard is
  * the one its token offset starts in; an oversized document straddles its
  * start shard, matching standard packing-with-truncation pipelines.
  *
  * Scale design — the distributed prefix sum. The naive plan
  * (`sum(w) OVER (PARTITION BY group ORDER BY id)`) hashes an ENTIRE group
  * onto one reducer: a 10 TB source becomes a single-task sort. Instead the
  * cumulative sum is computed in two levels:
  *   1. rows get a coarse `bucket = id div bucketSize`; the running sum
  *      within each (group, bucket) is a window over ≤ bucketSize rows;
  *   2. per-bucket totals (one row per bucket — corpus/bucketSize rows)
  *      get their own running sum per group, producing each bucket's
  *      starting offset; a broadcast-sized join adds the offset back.
  * Both windows are bounded (bucketSize rows; n/bucketSize buckets), so no
  * task ever sorts a whole group.
  */
object Packing {

  /** Appends `shard` (0-based within `groupCol`): the `budget`-unit bin
    * containing the row's starting offset in `orderCol` order.
    * `orderCol` must be unique within a group (it is the tie-free pack
    * order); `weightCol` must be a non-negative integral column. */
  def packShards(df: DataFrame, groupCol: String, orderCol: String,
                 weightCol: String, budget: Long,
                 bucketSize: Long = 4096L): DataFrame = {
    require(budget > 0, s"shard budget must be positive: $budget")
    require(bucketSize > 0, s"bucket size must be positive: $bucketSize")
    Seq("shard", "__bucket", "__lc", "__off").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column (reserved for the packer)")
    }
    // a negative or null weight would silently break prefix-sum
    // monotonicity and mis-shard everything after it — fail the job at
    // the row instead (same distributed raise_error idiom as
    // EntityTable's layout guards). The null arm is separate: concat
    // with a null value would null the whole error message.
    val guarded = df.withColumn(weightCol,
      when(col(weightCol).isNull,
        raise_error(lit(s"packShards: null $weightCol")))
        .when(col(weightCol) >= 0, col(weightCol))
        .otherwise(raise_error(concat(
          lit(s"packShards: negative $weightCol: "),
          col(weightCol).cast("string")))))
    val bucketed = guarded.withColumn("__bucket", expr(s"$orderCol div ${bucketSize}L"))
    val localW = Window.partitionBy(col(groupCol), col("__bucket"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__lc", sum(col(weightCol)).over(localW))
    val offsetW = Window.partitionBy(col(groupCol)).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed.groupBy(col(groupCol), col("__bucket"))
      .agg(sum(col(weightCol)).as("__bt"))
      .withColumn("__off", sum(col("__bt")).over(offsetW) - col("__bt"))
      .drop("__bt")
    // offsets is n/bucketSize rows: AQE broadcasts it when bucketSize is
    // tuned large enough, and falls back to a co-partitioned shuffle join
    // when it is not — either plan never sorts a whole group in one task.
    local
      .join(offsets, Seq(groupCol, "__bucket"))
      .withColumn("shard",
        expr(s"(__off + __lc - $weightCol) div ${budget}L"))
      .drop("__bucket", "__lc", "__off")
  }
}
