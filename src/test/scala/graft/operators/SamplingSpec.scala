package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = spark.range(0, n).select($"id")

  test("hashSplit: exhaustive, weight-proportional, repartition-stable") {
    val n = 20000
    val out = Sampling.hashSplit(ids(n), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exhaustive: every row gets exactly one split
    assert(counts.values.sum == n.toLong)
    assert(counts.keySet == Set("train", "val", "test"))
    // proportional within a loose tolerance (hash is uniform, not exact)
    assert(math.abs(counts("train") - 16000L) < 800, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 2000L) < 400, s"val=${counts("val")}")
    // a row's split NEVER depends on partitioning or corpus contents:
    // the same ids through any repartition get identical assignments
    val a = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(ids(n).repartition(7), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // growth-stable: assignments computed over a SUBSET agree row-for-row
    val sub = Sampling.hashSplit(ids(n / 10), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (id, s) => assert(a(id) == s) }
    // un-normalized weights mean the same thing as normalized ones
    val w2 = Sampling.hashSplit(ids(1000), "id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    w2.foreach { case (id, s) => assert(a(id) == s) }
  }

  test("hashSplit: weights must be positive and non-empty") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids(1), "id", Seq())
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids(1), "id", Seq("a" -> 1.0, "b" -> 0.0))
    }
    // a positive weight that rounds to ZERO buckets would silently never
    // be assigned — refuse instead of returning an empty split
    val e = intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids(1), "id",
        Seq("train" -> 0.99999, "val" -> 0.000005, "test" -> 0.000005))
    }
    assert(e.getMessage.contains("zero of the"))
  }

  test("reserved output columns are refused, not clobbered") {
    val df = ids(3).withColumn("copy_idx", lit(9))
    intercept[IllegalArgumentException] {
      Sampling.rebalance(df, "copy_idx", "id", Map())
    }
    val df2 = ids(3).withColumn("__rank", lit(1)).withColumn("q", lit(0.5))
    intercept[IllegalArgumentException] {
      Sampling.stratifiedQuota(df2, "q", "q", "id", 1)
    }
    val df3 = ids(3).withColumn("chunk", lit("x")).withColumn("text", lit("t"))
    intercept[IllegalArgumentException] {
      Chunking.chunkChars(df3, "text", 10, 0)
    }
  }

  test("sampleByHash: deterministic, monotone in fraction, distinct salts differ") {
    val n = 10000
    val s10 = Sampling.sampleByHash(ids(n), "id", 0.1).as[Long].collect().toSet
    val s20 = Sampling.sampleByHash(ids(n), "id", 0.2).as[Long].collect().toSet
    // subset property: raising the fraction only ADDS rows
    assert(s10.subsetOf(s20))
    assert(math.abs(s10.size - 1000) < 300, s"got ${s10.size}")
    // rerun is identical (no RNG state)
    assert(Sampling.sampleByHash(ids(n), "id", 0.1).as[Long].collect().toSet == s10)
    // a different salt draws a different (deterministic) sample
    val other = Sampling.sampleByHash(ids(n), "id", 0.1, salt = "other")
      .as[Long].collect().toSet
    assert(other != s10)
    // boundary fractions
    assert(Sampling.sampleByHash(ids(100), "id", 0.0).count() == 0)
    assert(Sampling.sampleByHash(ids(100), "id", 1.0).count() == 100)
  }

  test("rebalance: fractional weights give floor/ceil copies, weight-1 passthrough") {
    val n = 4000
    val df = spark.range(0, n).select($"id",
      when($"id" % 4 === 0, "de").when($"id" % 4 === 1, "fr")
        .otherwise("en").as("lang"))
    val out = Sampling.rebalance(df, "lang", "id", Map("de" -> 2.5, "fr" -> 0.0))
    val rows = out.select("id", "lang", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // weight 0 drops the stratum entirely
    assert(!rows.exists(_._2 == "fr"))
    // unlisted strata default to weight 1 with copy_idx 0
    val en = rows.filter(_._2 == "en")
    assert(en.length == n / 2 && en.forall(_._3 == 0))
    // weight 2.5: every doc appears 2 or 3 times, ~half get the 3rd copy
    val deCopies = rows.filter(_._2 == "de").groupBy(_._1).view.mapValues(_.length)
    assert(deCopies.values.forall(c => c == 2 || c == 3))
    val thirds = deCopies.values.count(_ == 3)
    assert(math.abs(thirds - 500) < 150, s"thirds=$thirds")
    // copy indices are dense 0..copies-1 (deterministic downstream keys)
    rows.filter(_._2 == "de").groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (0 until g.length))
    }
    // deterministic across repartitioning
    val again = Sampling.rebalance(df.repartition(11), "lang", "id",
      Map("de" -> 2.5, "fr" -> 0.0))
      .select("id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again == rows.map(r => (r._1, r._3)).toSet)
  }

  test("stratifiedQuota: top-k per stratum, deterministic tie-break") {
    val df = Seq(
      ("en", 1L, 0.9), ("en", 2L, 0.8), ("en", 3L, 0.8), ("en", 4L, 0.1),
      ("fr", 5L, 0.5), ("fr", 6L, 0.5),
      ("de", 7L, 0.3)
    ).toDF("lang", "doc_id", "quality")
    val out = Sampling.stratifiedQuota(df, "lang", "quality", "doc_id", k = 2)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // en: 0.9 then the 0.8-tie broken by lower doc_id; fr: both; de: one
    assert(out == Set(("en", 1L), ("en", 2L), ("fr", 5L), ("fr", 6L), ("de", 7L)))
    // quota columns are internal — never leak into the output schema
    val cols = Sampling.stratifiedQuota(df, "lang", "quality", "doc_id", 1).columns
    assert(!cols.contains("__rank") && !cols.contains("__salt"))
    // the salted two-phase plan returns the same rows at ANY partitioning
    val spread = Sampling.stratifiedQuota(df.repartition(13), "lang",
        "quality", "doc_id", k = 2)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(spread == out)
  }

  test("temperatureWeights: sqrt-proportional, exact scaled math, targets fit budget") {
    // strata sized 100/400/1600: sqrt ratios 1:2:4
    val df = spark.range(0, 2100).select($"id",
      when($"id" < 100, "small").when($"id" < 500, "mid").otherwise("big").as("src"))
    val out = Sampling.temperatureWeights(df, "src", budget = 700L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).sortBy(_._1)
    val byName = out.map(t => t._1 -> t).toMap
    assert(byName("small")._2 == 100L && byName("big")._2 == 1600L)
    // w_scaled is exactly floor(sqrt(n) * 2^20)
    out.foreach { case (_, n, ws, _, _) =>
      assert(ws == math.floor(math.sqrt(n.toDouble) * (1L << 20)).toLong)
    }
    // sqrt temper: weights are 1/7, 2/7, 4/7 exactly (sqrt of 100/400/1600
    // is integral, so no floor slop)
    assert(byName("small")._4 == byName("small")._3.toDouble / out.map(_._3).sum)
    assert(math.abs(byName("big")._4 - 4.0 / 7) < 1e-12)
    // integer targets never over-commit the budget
    assert(out.map(_._5).sum <= 700L)
    assert(byName("mid")._5 == 200L) // floor(2/7 * 700)
  }

  test("budgetSelect: identical to the one-window plan, strict budget keep") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 1000).select($"id",
      pmod($"id" * 37, lit(500)).as("score"),
      (pmod($"id" * 13, lit(20)) + 1).as("w"))
    val budget = 2500L
    val got = Sampling.budgetSelect(df, "score", "id", "w", budget, bandWidth = 64)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // oracle: plain global running sum in (score desc, id) order
    val w = Window.orderBy($"score".desc, $"id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("c", sum($"w").over(w)).filter($"c" <= budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == want && got.nonEmpty)
    // every kept row's running total is within budget; the next row would overflow
    assert(got.values.max <= budget)
    // bandWidth is a performance knob, not a semantics knob
    val other = Sampling.budgetSelect(df, "score", "id", "w", budget, bandWidth = 7)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(other == want)
  }

  test("budgetSelect: guards — reserved columns, negative budget") {
    val df = spark.range(3).select($"id", $"id".as("s"), $"id".as("w"))
    intercept[IllegalArgumentException] {
      Sampling.budgetSelect(df, "s", "id", "w", -1L)
    }
    intercept[IllegalArgumentException] {
      Sampling.budgetSelect(df.withColumn("cum_w", $"id"), "s", "id", "w", 10L)
    }
    // zero budget keeps nothing (no row's inclusive cum is <= 0)
    assert(Sampling.budgetSelect(df.withColumn("w", $"w" + 1), "s", "id", "w", 0L)
      .count() == 0L)
  }

  test("histTierSample: tiers at sketch quantiles, per-tier hash rates") {
    // 300 rows with scores 0..299: width 10 → 30 buckets; tertile cuts
    // land at buckets 9 and 19 (hi = 99 and 199)
    val df = spark.range(0, 300).select($"id", $"id".as("score"))
    val out = Sampling.histTierSample(df, "score", "id", width = 10L,
      keepPct = Seq(0, 50, 100), salt = "t")
    val byTier = out.groupBy($"tier")
      .agg(count(lit(1)).as("n"), min($"score").as("lo"),
        max($"score").as("hi"),
        sum(when($"kept", 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // boundaries: score <= 99 tier 0, 100..199 tier 1, >= 200 tier 2
    assert(byTier(0L)._1 == 100 && byTier(0L)._2 == 0 && byTier(0L)._3 == 99)
    assert(byTier(1L)._2 == 100 && byTier(1L)._3 == 199)
    assert(byTier(2L)._2 == 200 && byTier(2L)._3 == 299)
    // rates: 0% keeps nothing, 100% keeps everything, 50% keeps ~half
    assert(byTier(0L)._4 == 0)
    assert(byTier(2L)._4 == 100)
    assert(byTier(1L)._4 > 20 && byTier(1L)._4 < 80)
    // determinism: identical on a second run
    val again = Sampling.histTierSample(df, "score", "id", 10L,
      Seq(0, 50, 100), "t").collect().map(_.toSeq).toSet
    assert(again == out.collect().map(_.toSeq).toSet)
  }

  test("histTierSample: one tier degenerates to a flat hash sample") {
    import spark.implicits._
    val df = spark.range(0, 200).select($"id", $"id".as("score"))
    val out = Sampling.histTierSample(df, "score", "id", 10L, Seq(40), "t")
      .collect()
    assert(out.forall(_.getAs[Long]("tier") == 0L))
    val kept = out.count(_.getAs[Boolean]("kept"))
    assert(kept > 50 && kept < 110, s"kept=$kept") // ~40% of 200
    // and the same rows a two-equal-tier call with rate 40 would keep
    val two = Sampling.histTierSample(df, "score", "id", 10L,
        Seq(40, 40), "t")
      .collect().filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("id")).toSet
    assert(out.filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("id")).toSet == two)
  }
}
