package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packShards: two-level prefix sum equals the naive global cumsum") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 3000)
      .map(i => (s"src${i % 3}", i.toLong, 1L + rnd.nextInt(50).toLong))
      .toDF("source", "id", "w")
    // tiny bucketSize forces many buckets; budget forces many shards
    val fast = Packing.packShards(df.repartition(13), "source", "id", "w",
        budget = 100L, bucketSize = 7L)
      .select($"source", $"id", $"shard")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = Window.partitionBy($"source").orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("cum", sum($"w").over(w))
      .select($"source", $"id", expr("(cum - w) div 100L").as("shard"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fast.size == 3000 && fast == naive)
  }

  test("packShards: shards fill to budget, assignment is order-monotone") {
    val df = (0 until 100).map(i => ("s", i.toLong, 10L)).toDF("source", "id", "w")
    val out = Packing.packShards(df, "source", "id", "w",
        budget = 35L, bucketSize = 8L)
      .orderBy($"id").collect().map(_.getLong(3))
    // offsets 0,10,20,..: shard = offset div 35 → ids 0-3 shard 0, 4-6 shard 1…
    assert(out.toSeq.take(8) == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 2L))
    // monotone non-decreasing in pack order
    assert(out.sliding(2).forall(p => p(0) <= p(1)))
    // reserved column collision is refused
    intercept[IllegalArgumentException] {
      Packing.packShards(df.withColumn("shard", lit(1)), "source", "id", "w", 35L)
    }
  }
}
