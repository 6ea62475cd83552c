package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hll: estimate within raw-estimator error on a 10k-distinct stream") {
    // 10k distinct values, each appearing 3x — duplicates must not move
    // the registers (HLL is a DISTINCT counter)
    val vals = spark.range(0, 10000).select(concat(lit("v"), $"id").as("v"))
    val dup = vals.union(vals).union(vals)
    val out = Sketches.hllEstimate(dup.withColumn("g", lit("all")),
      Seq("g"), "v").collect()
    assert(out.length == 1)
    val est = out.head.getAs[Double]("hll_est")
    // raw HLL at m=4096: relative error ~1.04/sqrt(m) = 1.6%; allow 4 sigma
    assert(math.abs(est - 10000) / 10000 < 0.07, s"est=$est")
    // duplicates really did nothing: same registers as the distinct stream
    val once = Sketches.hllEstimate(vals.withColumn("g", lit("all")),
      Seq("g"), "v").collect().head.getAs[Double]("hll_est")
    assert(est == once)
  }

  test("hll: registers merge like any partial agg (union = merged sketch)") {
    val a = spark.range(0, 3000).select(concat(lit("x"), $"id").as("v"))
    val b = spark.range(2000, 5000).select(concat(lit("x"), $"id").as("v"))
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df.withColumn("g", lit("all")), Seq("g"), "v")
        .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val merged = regs(a.union(b))
    val byHand = (regs(a).toSeq ++ regs(b).toSeq).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).max }
    assert(merged == byHand)
  }

  test("hll: smaller p uses exactly p bucket bits (estimate stays sane)") {
    val vals = spark.range(0, 5000).select(concat(lit("w"), $"id").as("v"))
    val out = Sketches.hllEstimate(vals.withColumn("g", lit("all")),
      Seq("g"), "v", p = 8).collect().head
    val occ = out.getAs[Long]("occupied")
    val regSum = out.getAs[Long]("reg_sum")
    val est = out.getAs[Double]("hll_est")
    // at p=8 there are only 256 registers; a 12-bit bucket would blow past
    // that and drive reg_sum negative
    assert(occ <= 256 && regSum > 0)
    // raw-estimator error at m=256 is ~6.5%; allow a wide envelope
    assert(math.abs(est - 5000) / 5000 < 0.3, s"est=$est")
  }

  test("hll: p out of range refused") {
    val df = Seq("a").toDF("v")
    intercept[IllegalArgumentException] { Sketches.hllRegisters(df, Nil, "v", 3) }
    intercept[IllegalArgumentException] { Sketches.hllRegisters(df, Nil, "v", 13) }
  }

  test("cms: overestimate guarantee and exactness without collisions") {
    // zipf-ish: item i appears (200 - i) times
    val items = (0 until 200).flatMap(i => Seq.fill(200 - i)(s"item$i"))
      .toDF("item")
    val counters = Sketches.cmsCounters(items, "item")
    // grid is bounded: at most d*w cells, counts sum to d*occurrences
    val grid = counters.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(grid.length <= 4 * 1024)
    assert(grid.map(_._3).sum == 4L * items.count())
    val probes = (0 until 200 by 20).map(i => s"item$i").toDF("word")
    val est = Sketches.cmsQuery(counters, probes, "word")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    (0 until 200 by 20).foreach { i =>
      val exact = (200 - i).toLong
      assert(est(s"item$i") >= exact, s"item$i: ${est(s"item$i")} < $exact")
    }
    // absent item: only collisions can lift it above zero, never below
    val absent = Sketches.cmsQuery(counters, Seq("nope").toDF("word"), "word")
      .collect().head.getLong(1)
    assert(absent >= 0L)
  }

  test("cms: d and w must be positive") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException] { Sketches.cmsCounters(df, "item", 0, 8) }
    intercept[IllegalArgumentException] { Sketches.cmsCounters(df, "item", 2, 0) }
  }

  test("histQuantiles: the estimate bucket CONTAINS the exact type-1 quantile") {
    // skewed deterministic values: mostly small with a heavy tail, so
    // p50/p90/p99 land in different buckets
    val vals = (0 until 1000).map(i => (i.toLong, ((i * i) % 7919).toLong))
    val df = vals.toDF("id", "v")
    val width = 50L
    val qs = Seq((1L, 2L), (9L, 10L), (99L, 100L))
    val out = Sketches.histQuantiles(df, "v", width, qs)
      .collect()
      .map(r => ((r.getAs[Long]("q_num"), r.getAs[Long]("q_den")),
        (r.getAs[Long]("rank"), r.getAs[Long]("lo"), r.getAs[Long]("hi"))))
      .toMap
    val sorted = vals.map(_._2).sorted
    qs.foreach { case (qn, qd) =>
      val (rank, lo, hi) = out((qn, qd))
      assert(rank == (qn * sorted.size + qd - 1) / qd)
      val exact = sorted((rank - 1).toInt) // type-1: rank-th smallest
      assert(lo <= exact && exact <= hi,
        s"q=$qn/$qd exact $exact outside sketch bucket [$lo, $hi]")
      assert(hi - lo == width - 1)
    }
  }

  test("histQuantiles: state is bounded by the value range, not the corpus") {
    // 100k rows over a 40-bucket range: the mergeable state (the
    // histogram) must hold <= 40 rows no matter the row count
    val df = spark.range(100000).selectExpr("id % 2000 AS v")
    val hist = df.selectExpr("v div 50 AS bucket").groupBy("bucket").count()
    assert(hist.count() <= 40)
    val out = Sketches.histQuantiles(df, "v", 50L, Seq((1L, 2L))).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n") == 100000L)
  }

  test("histQuantiles: containment holds for NEGATIVE values (floor div)") {
    // values straddling zero: truncating division would fold (-50, 50)
    // into one bucket and break lo <= exact <= hi; floor bucketing (the
    // DuckDB // semantics) must keep the bound on both sides of zero
    val vals = (-500L to 499L).map(v => (v, v))
    val df = vals.toDF("id", "v")
    val width = 32L
    val qs = Seq((1L, 4L), (1L, 2L), (3L, 4L))
    val out = Sketches.histQuantiles(df, "v", width, qs)
      .collect()
      .map(r => r.getAs[Long]("q_num") ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("lo"), r.getAs[Long]("hi"))))
      .toMap
    val sorted = vals.map(_._2).sorted
    qs.foreach { case (qn, qd) =>
      val (rank, lo, hi) = out(qn)
      val exact = sorted((rank - 1).toInt)
      assert(lo <= exact && exact <= hi,
        s"q=$qn/$qd exact $exact outside [$lo, $hi]")
      assert(hi - lo == width - 1)
    }
    // the p25 estimate is genuinely negative — the branch under test
    assert(out(1L)._2 < 0)
  }

  test("histQuantilesBy: grouped sketch == per-group solo sketches") {
    // three groups with very different distributions in ONE frame
    val df = spark.range(0, 900).selectExpr(
      "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END AS g",
      "CASE WHEN id % 3 = 0 THEN id ELSE id * id % 4001 END AS v")
    val qs = Seq((1L, 2L), (9L, 10L))
    val grouped = Sketches.histQuantilesBy(df, Seq("g"), "v", 50L, qs)
      .collect()
      .map(r => ((r.getAs[String]("g"), r.getAs[Long]("q_num"))) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("rank"), r.getAs[Long]("lo"),
          r.getAs[Long]("hi")))).toMap
    for (g <- Seq("a", "b", "c")) {
      val solo = Sketches.histQuantiles(df.filter(s"g = '$g'"), "v", 50L, qs)
        .collect()
        .map(r => r.getAs[Long]("q_num") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("rank"), r.getAs[Long]("lo"),
            r.getAs[Long]("hi")))).toMap
      qs.foreach { case (qn, _) =>
        assert(grouped((g, qn)) == solo(qn), s"group $g q=$qn")
      }
    }
  }
}
