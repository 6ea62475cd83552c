package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.TextFunctions.hash28

/** Deterministic sampling / dataset-split operators for training pipelines.
  *
  * A 100 TB curation run needs splits that are (a) reproducible across
  * reruns and engines (no RNG state, no partition-order dependence),
  * (b) stable under corpus growth (a document's split never changes when
  * other documents are added or removed), and (c) shuffle-free (pure
  * per-row column math). All three fall out of hashing the row's stable id
  * with the portable 28-bit md5 prefix (`TextFunctions.hash28`) — the same
  * hash a SQL oracle replicates exactly, so splits are hash-verifiable.
  *
  * Spark's own `df.sample`/`sampleBy` use per-partition RNG streams: fast,
  * but resampling under ANY repartition and irreproducible across engines —
  * the wrong tool for dataset curation. (They remain available for
  * statistical sampling where identity-stability doesn't matter.)
  *
  * The reference has no sampling surface (its jobs are full scans); this is
  * capability upside mandated by the LLM-pipeline charter.
  */
object Sampling {

  /** The hash bucket in [0, buckets): `hash28(salt || id) % buckets`.
    * 28-bit hash over 10k buckets leaves each bucket ~2^14 hash values —
    * granular to 0.01% split weights. */
  def hashBucket(id: Column, salt: String, buckets: Int = 10000): Column =
    pmod(hash28(concat(lit(salt), id.cast("string"))), lit(buckets))

  /** Histogram-quantile stratified sampling — the CCNet-style
    * head/middle/tail pass: rows are split into `keepPct.size` tiers at
    * the equi-probability quantiles of an int64 score, and each tier is
    * hash-sampled at its own rate (e.g. keep 10% of the worst third, 50%
    * of the middle, all of the best). The quantile cuts come from the
    * BOUNDED histogram sketch ([[Sketches.histQuantiles]], the q113
    * machinery) — one count per width-sized bucket regardless of corpus
    * size — so no corpus-wide sort or global window ever runs; the cut
    * row broadcasts and membership + sampling are per-row column math.
    *
    * Deterministic end-to-end (hash sampling, not RNG) and exactly
    * replayable by an external engine: tier boundaries are the sketch's
    * integer bucket bounds, so a row with score equal to a cut lands in
    * the LOWER tier in both engines.
    *
    * @param keepPct per-tier keep percentage, lowest tier first
    * @return input + `tier` (0 = lowest scores) + `kept`
    */
  def histTierSample(df: DataFrame, scoreCol: String, idCol: String,
                     width: Long, keepPct: Seq[Int],
                     salt: String = "tier"): DataFrame = {
    require(keepPct.nonEmpty && keepPct.forall(p => p >= 0 && p <= 100),
      s"keepPct must be percentages: $keepPct")
    val n = keepPct.size
    // one tier = a flat hash sample: no cuts to sketch (histQuantiles
    // would reject the empty quantile list), every row lands in tier 0
    if (n == 1)
      return df.withColumn("tier", lit(0L))
        .withColumn("kept",
          hashBucket(col(idCol), salt, 100) < lit(keepPct.head.toLong))
    val cuts = Sketches.histQuantiles(df.select(col(scoreCol)), scoreCol,
      width, (1L until n.toLong).map(i => (i, n.toLong)))
    val cutRow = cuts.agg(sort_array(collect_list(col("hi"))).as("__cuts"))
    val rates = array(keepPct.map(p => lit(p.toLong)): _*)
    df.crossJoin(broadcast(cutRow))
      .withColumn("tier",
        size(filter(col("__cuts"), c => c < col(scoreCol))).cast(LongType))
      .withColumn("kept",
        hashBucket(col(idCol), salt, 100) <
          element_at(rates, (col("tier") + 1).cast("int")))
      .drop("__cuts")
  }

  /** Assign each row a named split, deterministically from its id.
    *
    * `weights` are (name, weight) pairs; weights are normalized, then laid
    * out as contiguous bucket ranges in the GIVEN order — so
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)` maps buckets
    * [0,8000) → train, [8000,9000) → val, [9000,10000) → test. Per-row
    * column math only: no shuffle, no RNG, stable under corpus growth. */
  def hashSplit(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
                salt: String = "split", splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty, "at least one split required")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    val buckets = 10000
    val total = weights.map(_._2).sum
    // cumulative upper bucket bounds; the last is pinned to `buckets` so
    // rounding never leaves a bucket unassigned
    val bounds = weights.map(_._2 / total).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * buckets).toInt)
      .updated(weights.size - 1, buckets)
    // a positive-weight split whose rounded range collapsed to zero buckets
    // would silently never be assigned — fail instead
    (0 +: bounds).sliding(2).zip(weights.iterator).foreach {
      case (Seq(lo, hi), (name, w)) =>
        require(hi > lo, s"split '$name' (weight $w) rounds to zero of the " +
          s"$buckets hash buckets; raise its weight above 1/$buckets")
    }
    val b = hashBucket(col(idCol), salt, buckets)
    val expr = weights.map(_._1).zip(bounds).reverse match {
      case (lastName, _) +: rest =>
        rest.foldLeft(lit(lastName)) { case (acc, (name, bound)) =>
          when(b < bound, name).otherwise(acc)
        }
    }
    df.withColumn(splitCol, expr)
  }

  /** Keep a deterministic `fraction` of rows by id hash — the reproducible
    * counterpart of `df.sample(fraction)`. Subset property holds for free:
    * sampleByHash(0.1) ⊆ sampleByHash(0.2) at the same salt. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
                   salt: String = "sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1]: $fraction")
    val buckets = 10000
    df.filter(hashBucket(col(idCol), salt, buckets)
      < math.round(fraction * buckets).toInt)
  }

  /** Rebalance strata by fractional repetition weights — the "data mixing"
    * step that up/down-weights languages or sources before training.
    *
    * A weight w replicates each row of its stratum floor(w) times, plus one
    * more copy for a deterministic hash-selected (w - floor(w)) fraction of
    * ids — so expected multiplicity is exactly w, per-row multiplicity is
    * reproducible (no RNG), and the output carries `copy_idx` (0-based) so
    * repeated rows stay distinguishable and deterministic downstream.
    * Weights below 1 subsample (floor 0 + fractional copy); missing strata
    * default to weight 1. Pure column math: explode over a per-row copy
    * count — scan-shaped, no shuffle. */
  def rebalance(df: DataFrame, strataCol: String, idCol: String,
                weights: Map[String, Double],
                salt: String = "rebalance"): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 100),
      s"weights must be in [0, 100]: $weights")
    require(!df.columns.contains("copy_idx"),
      "input already has a copy_idx column (the output's copy counter)")
    val buckets = 10000
    val whole = weights.foldLeft(lit(1)) { case (acc, (name, w)) =>
      when(col(strataCol) === name, lit(math.floor(w).toInt)).otherwise(acc)
    }
    val fracBound = weights.foldLeft(lit(0)) { case (acc, (name, w)) =>
      val frac = w - math.floor(w)
      when(col(strataCol) === name,
        lit(math.round(frac * buckets).toInt)).otherwise(acc)
    }
    val copies = whole +
      when(hashBucket(col(idCol), salt, buckets) < fracBound, 1).otherwise(0)
    // copies = 0 must yield an EMPTY array (sequence(0, -1) throws), so the
    // row drops out of the explode entirely
    df.withColumn("copy_idx",
      explode(when(copies > 0, sequence(lit(0), copies - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Temperature-weighted mixture weights (α = 1/2): per-stratum sampling
    * weight ∝ n^α — the standard size-tempered domain mixing of multilingual
    * / multi-source training runs (upweights small domains, flattens big
    * ones) at the classic square-root temperature.
    *
    * Engine-portable determinism: n^α is irrational, and a naive double
    * `sum(sqrt(n))` denominator is addition-order-dependent — so sqrt(n)
    * is quantized to an exact scaled integer `w_scaled =
    * floor(sqrt(n) · 2^20)` first (IEEE sqrt is correctly rounded, the
    * 2^20 scale is an exact exponent shift, floor is exact), and the
    * denominator is an order-free int64 sum. The final `weight` and
    * `target_n` are then single double ops on identical operands in any
    * engine. One tiny aggregation (one row per stratum) drives everything:
    * the scale cost is one partial-agg count shuffle.
    *
    * @param budget total row budget to apportion; `target_n` =
    *        trunc(weight · budget) per stratum (feed to [[rebalance]] as
    *        target_n / n to materialize the mix).
    * @return (stratum, n, w_scaled, weight, target_n)
    */
  def temperatureWeights(df: DataFrame, strataCol: String,
                         budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be nonnegative: $budget")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("w_scaled",
        floor(sqrt(col("n").cast(DoubleType)) * (1L << 20)).cast(LongType))
    // the denominator is a single-partition window over the per-stratum
    // rows (bounded by the stratum count, NOT the corpus) — one corpus
    // scan total, where a crossJoin(agg) would re-scan the corpus to
    // produce one number
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("__denom", sum(col("w_scaled")).over(all))
      .withColumn("weight",
        col("w_scaled").cast(DoubleType) / col("__denom").cast(DoubleType))
      .withColumn("target_n",
        floor(col("weight") * budget).cast(LongType))
      .drop("__denom")
  }

  /** Greedy budget-constrained corpus selection: walk rows in
    * (`scoreCol` desc, `idCol` asc) order and keep every row while the
    * running `weightCol` total stays ≤ `budget` — "take the best documents
    * until the token budget is spent". `scoreCol` must be integral (use a
    * scaled-integer quality, e.g. floor(quality·2^20), so ordering is
    * engine-exact); the straddling row is NOT truncated (strict cum ≤
    * budget keep).
    *
    * Scale shape: the running total is NOT one global window (that plan
    * funnels the whole corpus through a single task). Rows are banded by
    * coarse score (`bandWidth` score units per band); the cumulative sum
    * is a bounded window inside each band plus a band-offset prefix sum
    * over the tiny per-band totals — the same two-level decomposition as
    * [[Packing.packShards]]. Band occupancy bounds the largest window
    * task; tune `bandWidth` to the score distribution (a pathological
    * corpus with ALL rows on one exact score still degrades to one band —
    * at that point there is no meaningful "best" order to walk anyway).
    *
    * @return input rows that fit the budget, plus `cum_<weightCol>` —
    *         the running total INCLUDING the row itself.
    */
  def budgetSelect(df: DataFrame, scoreCol: String, idCol: String,
                   weightCol: String, budget: Long,
                   bandWidth: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, s"budget must be nonnegative: $budget")
    require(bandWidth > 0, s"bandWidth must be positive: $bandWidth")
    val cumCol = s"cum_$weightCol"
    Seq("__band", "__lc", "__off", cumCol).foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column (reserved for budgetSelect)")
    }
    // ascending band order == descending score order (negated div keeps
    // band boundaries aligned to score bands; scores may be negative)
    val banded = df.withColumn("__band",
      -floor(col(scoreCol).cast(DoubleType) / bandWidth).cast(LongType))
    val ord = Seq(col(scoreCol).desc, col(idCol).asc)
    val localW = Window.partitionBy(col("__band")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = banded.withColumn("__lc", sum(col(weightCol)).over(localW))
    val offW = Window.orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one row per band: the offset window is over a tiny frame, and the
    // join back is broadcast-sized
    val offsets = banded.groupBy(col("__band"))
      .agg(sum(col(weightCol)).as("__bt"))
      .withColumn("__off", sum(col("__bt")).over(offW) - col("__bt"))
      .drop("__bt")
    local.join(broadcast(offsets), Seq("__band"))
      .withColumn(cumCol, col("__off") + col("__lc"))
      .filter(col(cumCol) <= budget)
      .drop("__band", "__lc", "__off")
  }

  /** Per-stratum quota: keep the top `k` rows of each stratum by `order`
    * (descending, ties broken by id for determinism). The curation pattern
    * "best k docs per language/source".
    *
    * Scale shape: a single window partitioned by the stratum key would
    * funnel EVERY row of a stratum through one task — a skew cliff when one
    * language holds billions of documents. So the quota runs in two phases:
    * (1) a pre-window partitioned by (stratum, input partition id) reduces
    * each stratum to ≤ k rows per input partition with no cross-partition
    * concentration; (2) the final stratum-keyed window then ranks ≤ k ×
    * numPartitions survivors per stratum — bounded regardless of stratum
    * size. Results are identical to the one-window plan: every global
    * top-k row is by definition inside its own partition's local top-k,
    * so phase 1 never drops a winner (same argument as combiner
    * correctness for max). */
  def stratifiedQuota(df: DataFrame, strataCol: String, orderCol: String,
                      idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive: $k")
    Seq("__salt", "__rank").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column (reserved for the quota's internals)")
    }
    val ord = Seq(col(orderCol).desc, col(idCol).asc)
    val local = Window.partitionBy(col(strataCol), col("__salt")).orderBy(ord: _*)
    val global = Window.partitionBy(col(strataCol)).orderBy(ord: _*)
    df.withColumn("__salt", spark_partition_id())
      .withColumn("__rank", row_number().over(local))
      .filter(col("__rank") <= k)
      .withColumn("__rank", row_number().over(global))
      .filter(col("__rank") <= k)
      .drop("__salt", "__rank")
  }
}
