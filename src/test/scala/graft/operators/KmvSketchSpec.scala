package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.hash28

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 128

  /** Brute-force distinct hash set of a group's values. */
  private def bruteHashes(vals: Seq[String]): Seq[Long] = {
    val df = vals.toDF("v").select(hash28($"v").as("h")).distinct()
    df.collect().map(_.getLong(0)).sorted.toSeq
  }

  test("sketch holds exactly the k smallest distinct hashes per group") {
    val vals = (0 until 2000).map(i => s"item$i")
    val df = vals.flatMap(v => Seq(v, v)) // duplicates must not matter
      .toDF("v").withColumn("g", lit("a"))
    val sk = Sketches.kmvSketch(df, Seq("g"), "v", K)
      .collect().map(_.getAs[Long]("h")).sorted.toSeq
    assert(sk == bruteHashes(vals).take(K))
  }

  test("small group: sketch is the whole distinct set (exact mode)") {
    val df = (0 until 40).map(i => s"x$i").toDF("v").withColumn("g", lit("s"))
    val sk = Sketches.kmvSketch(df, Seq("g"), "v", K).collect()
    assert(sk.length == 40)
  }

  test("pair overlap: union sketch == bottom-k of the true union") {
    val a = (0 until 1500).map(i => s"common$i") ++
      (0 until 800).map(i => s"onlya$i")
    val b = (0 until 1500).map(i => s"common$i") ++
      (0 until 700).map(i => s"onlyb$i")
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val sk = Sketches.kmvSketch(df, Seq("g"), "v", K)
    val out = Sketches.kmvPairOverlap(sk, "g", K).collect()
    assert(out.length == 1)
    val row = out.head
    // KMV closure property: the k smallest of sketch(A) ∪ sketch(B) ARE
    // the k smallest of distinct(A ∪ B) — so kth_hash must equal the
    // brute-force union's kth smallest hash.
    val unionKth = bruteHashes((a ++ b).distinct)(K - 1)
    assert(row.getAs[Long]("kth_hash") == unionKth)
    assert(row.getAs[Long]("n_kept") == K)

    // estimator accuracy: σ ≈ D/√(k−1) ≈ 9%; allow 4σ
    val estU = row.getAs[Double]("est_union")
    val trueU = (a ++ b).distinct.size.toDouble
    assert(math.abs(estU - trueU) / trueU < 0.36, s"est_union=$estU")
    val estI = row.getAs[Double]("est_inter")
    assert(math.abs(estI - 1500.0) / 1500.0 < 0.5, s"est_inter=$estI")
  }

  test("disjoint groups estimate ~zero intersection; exact mode kicks in") {
    val a = (0 until 50).map(i => s"lefty$i")
    val b = (0 until 60).map(i => s"righty$i")
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val sk = Sketches.kmvSketch(df, Seq("g"), "v", K)
    val row = Sketches.kmvPairOverlap(sk, "g", K).collect().head
    // 110 distinct < k: union sketch is exact, estimate == true count
    assert(row.getAs[Long]("n_kept") == 110)
    assert(row.getAs[Double]("est_union") == 110.0)
    assert(row.getAs[Long]("n_common") == 0)
    assert(row.getAs[Double]("est_inter") == 0.0)
  }

  test("exact mode: est_inter collapses to the exact intersection") {
    val shared = (0 until 40).map(i => s"both$i")
    val a = shared ++ (0 until 20).map(i => s"onlya$i")
    val b = shared ++ (0 until 20).map(i => s"onlyb$i")
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val sk = Sketches.kmvSketch(df, Seq("g"), "v", K)
    val row = Sketches.kmvPairOverlap(sk, "g", K).collect().head
    // 80 distinct < k: the union sketch is the whole union, n_common IS
    // the exact intersection, and est_inter = 80 * 40/80 = 40 exactly
    // (dividing by k here — the pre-fix behavior — returned 25)
    assert(row.getAs[Long]("n_kept") == 80)
    assert(row.getAs[Double]("est_union") == 80.0)
    assert(row.getAs[Long]("n_common") == 40)
    assert(row.getAs[Double]("est_inter") == 40.0)
  }

  test("all unordered group pairs appear exactly once") {
    val df = Seq("a", "b", "c").flatMap(g =>
      (0 until 30).map(i => (g, s"$g$i"))).toDF("g", "v")
    val sk = Sketches.kmvSketch(df, Seq("g"), "v", K)
    val pairs = Sketches.kmvPairOverlap(sk, "g", K).collect()
      .map(r => (r.getAs[String]("g_a"), r.getAs[String]("g_b"))).toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}
