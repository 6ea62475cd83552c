package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInner: row-identical to the plain inner join under heavy skew") {
    val rnd = new scala.util.Random(11)
    // 90% of left rows share ONE hot key
    val left = (0 until 5000)
      .map(i => (if (rnd.nextInt(10) < 9) 7L else rnd.nextInt(40).toLong, i.toLong))
      .toDF("k", "lid")
    val right = (0 until 40).map(j => (j.toLong, s"r$j")).toDF("k", "payload")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"lid", $"payload").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = canon(SkewJoin.saltedInner(left, right, "k", 8, "lid"))
    val plain = canon(left.join(right, "k"))
    assert(salted == plain && salted.length == 5000)
    // duplicate right keys multiply matches exactly like the plain join
    val dupRight = right.unionAll(right.limit(5))
    assert(canon(SkewJoin.saltedInner(left, dupRight, "k", 4, "lid")) ==
      canon(left.join(dupRight, "k")))
    // reserved column is refused
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInner(left.withColumn("__salt", lit(1)), right, "k", 4, "lid")
    }
  }
}
