package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.TextFunctions.hash28

/** Mergeable sketches over the portable md5 hash — the 100 TB answers to
  * "how many distinct?" (HyperLogLog) and "how often?" (Count–Min) when
  * exact aggregation is too expensive to even shuffle.
  *
  * Both sketches are built as ordinary partial-aggregable DataFrame
  * transforms, so Spark merges them map-side exactly like any other agg:
  *  - HLL state is `m` registers per group — `groupBy(bucket).max(rho)`
  *    is commutative, so a 1000-executor scan reduces to m rows per group
  *    no matter the corpus size.
  *  - CMS state is a `d × w` counter grid — `groupBy(row, pos).count` is
  *    a bounded 4096-row table regardless of corpus size; probes join
  *    against it broadcast.
  *
  * Engine portability is the design constraint that usually makes sketches
  * untestable: register values derive from the md5-based `hash28` and pure
  * integer/string math (`bin()` string length for the leading-zero rank —
  * identical in Spark and DuckDB; no transcendental log2), and the
  * harmonic-mean denominator is summed as exact scaled int64, so an
  * external oracle reproduces the ENTIRE sketch state and estimate
  * bit-for-bit — including its approximation error.
  *
  * The reference has no sketch surface; this is LLM-pipeline/OLAP upside
  * (corpus vocabulary estimation, heavy-hitter token monitoring).
  */
object Sketches {

  /** HLL bucket count exponent p → m = 2^p registers. The 28-bit hash
    * spends p bits on the bucket and 16 must remain for the rank, so
    * p ≤ 12. */
  val HllRankBits = 16

  /** Per-group HLL registers: (groupCols*, bucket, rho) with
    * rho = 1 + leading-zeros of the rank field (0 rank → max rho 17).
    * Occupied buckets only — absent buckets mean rho 0. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 28 - HllRankBits, s"p must be in [4, 12]: $p")
    val h = hash28(col(valueCol).cast("string"))
    val rankMod = 1L << HllRankBits
    // bucket = the LOW p bits of the hash's 12-bit high field (mod 2^p is
    // a no-op at the default p = 12); rank = the low 16 bits. The q85
    // oracle mirrors this exact (div, mod) pair.
    val bucket = pmod(floor(h.divide(lit(rankMod))).cast(LongType), lit(1L << p))
    val r = pmod(h, lit(rankMod))
    // rank of the 16-bit remainder: 17 - bit_length(r); bin(r) has no
    // leading zeros in either engine, so its length IS bit_length
    val rho = when(r === 0L, lit(HllRankBits + 1))
      .otherwise(lit(HllRankBits + 1) - length(bin(r)))
      .cast(IntegerType)
    df.select((groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Per-group raw HLL cardinality estimate:
    * (groupCols*, occupied, reg_sum, hll_est) where `reg_sum` is the
    * harmonic denominator Σ 2^(17−rho) over ALL m registers (empty → 2^17)
    * as an exact int64 — addition-order-free — and
    * `hll_est = α_m · m² · 2^17 / reg_sum` (the classic raw estimator; no
    * small/large-range corrections — they need `ln`, whose last ULP is
    * engine-specific, and the oracle-checked contract here is exactness
    * of the SKETCH, not of the correction branches). */
  def hllEstimate(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Int = 12): DataFrame = {
    val m = 1L << p
    val scale = 1L << (HllRankBits + 1)
    val regs = hllRegisters(df, groupCols, valueCol, p)
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("occupied"),
        sum(call_function("shiftleft", lit(1L),
          (lit(HllRankBits + 1) - col("rho")).cast(IntegerType))).as("__occ_sum"))
      .withColumn("reg_sum",
        col("__occ_sum") + (lit(m) - col("occupied")) * scale)
      .withColumn("hll_est",
        lit(hllAlpha(m) * (m * m * scale).toDouble) /
          col("reg_sum").cast(DoubleType))
      .drop("__occ_sum")
  }

  /** α_m for the raw estimator (m ≥ 128 branch of the HLL paper). */
  def hllAlpha(m: Long): Double = 0.7213 / (1.0 + 1.079 / m)

  /** Count–Min counter grid over item occurrences: (row, pos, cnt) for
    * d rows × w counters; row j's position of item x is
    * `hash28("cms" || j || "|" || x) mod w`. Bounded d·w rows out no
    * matter the corpus size (full map-side combine). */
  def cmsCounters(items: DataFrame, itemCol: String, d: Int = 4,
                  w: Int = 1024): DataFrame = {
    require(d > 0 && w > 0, s"d and w must be positive: d=$d w=$w")
    items
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("row"),
          cmsPos(col(itemCol), j, w).as("pos"))): _*)).as("c"))
      .select(col("c.row").as("row"), col("c.pos").as("pos"))
      .groupBy(col("row"), col("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Row-j counter position of an item — mirrored in the oracle. */
  def cmsPos(item: Column, j: Int, w: Int): Column =
    pmod(hash28(concat(lit(s"cms$j|"), item.cast("string"))), lit(w.toLong))

  /** Point-query a probe set against the grid: (item, cms_est) with
    * `cms_est = min over rows of the item's counter` (0 if any row's
    * counter is absent). The CMS guarantee — estimate ≥ true count — is
    * deterministic here and oracle-verified. Probes × counters is a
    * broadcast join (≤ d·w counter rows). */
  def cmsQuery(counters: DataFrame, probes: DataFrame,
               itemCol: String, d: Int = 4, w: Int = 1024): DataFrame = {
    val positions = probes
      .select(col(itemCol), explode(array((0 until d).map(j =>
        struct(lit(j).as("row"),
          cmsPos(col(itemCol), j, w).as("pos"))): _*)).as("c"))
      .select(col(itemCol), col("c.row").as("row"), col("c.pos").as("pos"))
    positions
      .join(broadcast(counters), Seq("row", "pos"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Per-group KMV (k-minimum-values / bottom-k) distinct sketch: the k
    * smallest DISTINCT `hash28` values of the group — (groupCols*, h),
    * ≤ k rows per group. The sketch HLL can't be: KMV sketches support
    * set ALGEBRA — the union of two sketches is computable from sketch
    * elements alone (the k smallest of their concatenation), and element
    * membership gives an intersection estimate ([[kmvPairOverlap]]) —
    * the "how much do these two corpora overlap?" question that drives
    * cross-source dedup budgeting and contamination triage.
    *
    * Scale shape: the distinct-(group, h) aggregation is the only
    * corpus-sized stage (one shuffle, full map-side combine); the
    * bottom-k cut is a per-group row_number window that Spark rewrites to
    * a PARTIAL WindowGroupLimit — each map task keeps only its own k
    * smallest before the shuffle, so no executor ever sorts a group's
    * full distinct set (plan-verified). All downstream algebra touches
    * k·|groups| rows only.
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int): DataFrame =
    kmvSketchOfHashes(
      df.select((groupCols.map(col) :+
        hash28(col(valueCol).cast("string")).as("h")): _*),
      groupCols, k)

  /** [[kmvSketch]] over an ALREADY-HASHED stream `(groupCols*, h)` — for
    * callers that pre-hash once and reuse the hashed frame (values never
    * shuffle; the distinct and every join run over int64). */
  def kmvSketchOfHashes(hashed: DataFrame, groupCols: Seq[String],
                        k: Int): DataFrame = {
    require(k > 1, s"k must be > 1 (the estimator uses k-1): $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    hashed.select((groupCols.map(col) :+ col("h")): _*)
      .distinct()
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Merge two KMV sketch frames `(groupCols*, h)`: the k smallest of
    * their union — KMV's closure property means the merged sketch is
    * EXACTLY the sketch of the combined underlying data, so sketches
    * maintain incrementally: `merged = kmvMerge(yesterday, todayBatch)`
    * with no re-scan of yesterday's corpus. This is the streaming
    * maintenance step (fold each micro-batch's sketch into persisted
    * state); spec-pinned equal to the batch-built sketch in
    * StreamingCellsSpec. */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String],
               k: Int): DataFrame =
    kmvSketchOfHashes(a.unionByName(b), groupCols, k)

  /** Distinct-overlap estimates for every unordered pair of groups in a
    * [[kmvSketch]] frame `(groupCol, h)`:
    *
    *   (g_a, g_b, n_kept, kth_hash, n_common, est_union, est_inter)
    *
    * union sketch = the k smallest of sketch(A) ∪ sketch(B);
    * `est_union` = (k−1)·2^28 / h_k (exact-mode: the union sketch's size
    * when it holds fewer than k values); `est_inter` = est_union · ρ with
    * ρ = (elements of the union sketch present in BOTH sketches) /
    * (the union sketch's size: k normally, n_kept in exact mode — where
    * the estimate collapses to the exact intersection) — the standard
    * KMV Jaccard-style estimator. Deterministic: both estimates
    * are single fixed-order double chains over int64 sketch state, so an
    * external oracle replays them bit-for-bit, approximation error
    * included.
    *
    * Scale shape: pairs × sketches only — every frame after the input is
    * ≤ k·|groups|² rows; nothing rereads the corpus.
    */
  def kmvPairOverlap(sketch: DataFrame, groupCol: String, k: Int,
                     space: Long = 1L << 28): DataFrame = {
    // The sketch subtree is referenced three times below (both group-list
    // legs + the union join); unpersisted, Spark would re-run its window
    // sort per reference — persist the k·|groups|-row frame instead
    // (caller releases via OperatorCaches, the LSH-signature pattern).
    val sk = OperatorCaches.register(
      sketch.withColumnRenamed(groupCol, "g").persist())
    val g = sk.select(col("g")).distinct()
    val pairs = g.select(col("g").as("g_a"))
      .join(g.select(col("g").as("g_b")), col("g_a") < col("g_b"))
    val legs = pairs.select(col("g_a"), col("g_b"),
      explode(array(col("g_a"), col("g_b"))).as("g"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g_a"), col("g_b")).orderBy(col("h"))
    val unionVals = broadcast(legs)
      .join(sk, "g")
      .groupBy(col("g_a"), col("g_b"), col("h"))
      .agg(max(col("g") === col("g_a")).as("in_a"),
        max(col("g") === col("g_b")).as("in_b"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
    unionVals.groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_kept"),
        max(col("h")).as("kth_hash"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L))
          .as("n_common"))
      .withColumn("est_union",
        when(col("n_kept") < k, col("n_kept").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble * space) /
            col("kth_hash").cast(DoubleType)))
      .withColumn("est_inter",
        // ρ's denominator is the union sketch's SIZE (k normally, n_kept
        // in exact mode — where n_common IS the exact intersection and
        // est_union·n_common/n_kept returns exactly it; dividing by k
        // there would underestimate small groups' overlap by k/n_kept)
        col("est_union") *
          (col("n_common").cast(DoubleType) / col("n_kept").cast(DoubleType)))
  }

  /** Fixed-width histogram quantile sketch — the bounded-state answer to
    * "what's the p99?" that exact quantiles (q67's distinct-value
    * cumulative walk) can't give when the value universe itself is huge:
    * state is one count per occupied bucket (floor `value / width`,
    * matching DuckDB's `//` for negatives too),
    * partial-aggregable and mergeable like any groupBy, so a
    * 1000-executor scan reduces to ≤ range/width rows regardless of
    * corpus size.
    *
    * For each requested quantile qNum/qDen the estimate is the FIRST
    * bucket whose cumulative count reaches the type-1 rank
    * `ceil(q·n) = (qNum·n + qDen − 1) div qDen` — the bucket provably
    * CONTAINS the exact rank-th value, so the deterministic error bound
    * is the bucket width: `lo ≤ exact quantile ≤ hi` (spec-pinned
    * against the exact sort). Pure integer math end-to-end (int64
    * ranks, div bucketing), so an oracle replays estimates AND their
    * quantization error bit-for-bit. The cumulative window runs over
    * BUCKET rows (already aggregated, bounded), never corpus rows —
    * the q82 global-window-above-aggregate shape.
    *
    * @param quantiles (qNum, qDen) rationals, e.g. (1,2) (9,10) (99,100)
    * @return one row per quantile: (q_num, q_den, n, rank, bucket,
    *         lo, hi) with [lo, hi] the bucket's value interval
    */
  def histQuantiles(df: DataFrame, valueCol: String, width: Long,
                    quantiles: Seq[(Long, Long)]): DataFrame =
    histQuantilesBy(df, Nil, valueCol, width, quantiles)

  /** Per-GROUP [[histQuantiles]]: one sketch per `groupCols` combination
    * in a single pass — "p99 document length PER LANGUAGE" without ever
    * splitting the corpus into per-group jobs. Same bounded state per
    * group (≤ range/width bucket rows); the cumulative window partitions
    * by the group, so it still runs over aggregated bucket rows only, and
    * per-group totals ride along as a window sum instead of a join.
    * With `groupCols = Nil` this is exactly the global sketch. */
  def histQuantilesBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      width: Long, quantiles: Seq[(Long, Long)]): DataFrame = {
    require(width > 0, s"bucket width must be positive: $width")
    require(quantiles.nonEmpty, "at least one quantile required")
    require(quantiles.forall { case (n, d) => n > 0 && n <= d },
      s"quantiles must be rationals in (0, 1]: $quantiles")
    val g = groupCols.map(col)
    val W = org.apache.spark.sql.expressions.Window
    val byGroup =
      if (groupCols.isEmpty) W.partitionBy() else W.partitionBy(g: _*)
    // FLOOR division (DuckDB's `//`), not Spark's truncating `div`:
    // truncation would fold every value in (-width, width) into bucket 0
    // and break the documented lo <= exact <= hi containment for
    // negative values — the adjustment subtracts 1 exactly when the
    // truncated remainder is negative
    val bucket = expr(
      s"""CAST($valueCol AS BIGINT) div $width -
         |(CASE WHEN CAST($valueCol AS BIGINT) % $width < 0
         |      THEN 1 ELSE 0 END)""".stripMargin)
    val hist = df
      .select((g :+ bucket.as("bucket")): _*)
      .groupBy((g :+ col("bucket")): _*).agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        byGroup.orderBy(col("bucket")).rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(byGroup))
    val targets = explode(array(quantiles.map { case (qn, qd) =>
      struct(lit(qn).as("q_num"), lit(qd).as("q_den"))
    }: _*)).as("q")
    cum.select((g ++ Seq(col("bucket"), col("cum"), col("n"), targets)): _*)
      .select((g ++ Seq(col("bucket"), col("cum"), col("n"),
        col("q.q_num").as("q_num"), col("q.q_den").as("q_den"))): _*)
      .withColumn("rank", expr("(q_num * n + q_den - 1) div q_den"))
      .filter(col("cum") >= col("rank"))
      .groupBy((g ++ Seq(col("q_num"), col("q_den"), col("n"),
        col("rank"))): _*)
      .agg(min(col("bucket")).as("bucket"))
      .select((g ++ Seq(col("q_num"), col("q_den"), col("n"), col("rank"),
        col("bucket"), (col("bucket") * width).as("lo"),
        (col("bucket") * width + (width - 1)).as("hi"))): _*)
  }
}
