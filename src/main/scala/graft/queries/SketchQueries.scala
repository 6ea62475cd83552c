package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.{tokens, Stopwords}
import graft.operators.Sketches

/** Mergeable-sketch operators as oracle-checked queries.
  *
  * Sketches are normally untestable against an external engine (their
  * state depends on a private hash); these are built on the portable md5
  * `hash28`, so the DuckDB oracle reproduces the ENTIRE sketch state —
  * registers, counters, and the estimates INCLUDING their approximation
  * error — bit-for-bit. The exact value sits beside the estimate in each
  * output row, so the compare also documents sketch accuracy.
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Non-empty lowercase whitespace tokens — the item universe of both
    * sketches (mirrors q78's feature tokens). */
  private def toks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select($"lang",
      explode(LexicalQueries.toks($"text")).as("tok"))
  }
  private val SqlToks = LexicalQueries.SqlToks

  // ── q85: HyperLogLog vocabulary estimate per language — registers are
  // groupBy(bucket).max(rho) (commutative: merges map-side like any agg;
  // m rows per group no matter the corpus), the harmonic denominator is
  // an exact scaled-int64 sum (addition-order-free), and the only double
  // math is one division on identical operands. n_exact rides along so
  // the compare documents the estimator's error too. ─────────────────────
  val HllP = 12

  val q85_hll_vocab: Q = (s, d) => {
    import s.implicits._
    val t = toks(s, d)
    val est = Sketches.hllEstimate(t, Seq("lang"), "tok", HllP)
    val exact = t.groupBy($"lang").agg(countDistinct($"tok").as("n_exact"))
    exact.join(est, "lang")
      .select($"lang", $"n_exact", $"occupied", $"reg_sum", $"hll_est")
      .orderBy($"lang")
  }
  lazy val q85_sql: String = {
    val m = 1L << HllP
    val rankMod = 1L << Sketches.HllRankBits         // 65536
    val scale = 1L << (Sketches.HllRankBits + 1)     // 131072
    val maxRho = Sketches.HllRankBits + 1            // 17
    // the numerator literal must be the SAME double Spark embeds
    val numer = Sketches.hllAlpha(m) * (m * m * scale).toDouble
    s"""WITH t AS (
       |  SELECT lang, unnest($SqlToks) AS tok FROM documents),
       |dv AS (SELECT DISTINCT lang, tok FROM t),
       |h AS (
       |  SELECT lang, ('0x'||substr(md5(tok),1,7))::BIGINT AS h FROM dv),
       |r AS (
       |  SELECT lang, (h // $rankMod) % $m AS bucket,
       |    CASE WHEN h % $rankMod = 0 THEN $maxRho
       |         ELSE $maxRho - length(bin(h % $rankMod)) END AS rho
       |  FROM h),
       |regs AS (
       |  SELECT lang, bucket, max(rho) AS rho FROM r GROUP BY lang, bucket),
       |agg AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS occupied,
       |    CAST(sum(1::BIGINT << ($maxRho - rho)) AS BIGINT) AS occ_sum
       |  FROM regs GROUP BY lang),
       |est AS (
       |  SELECT lang, occupied,
       |    occ_sum + ($m - occupied) * $scale AS reg_sum
       |  FROM agg),
       |exact AS (
       |  SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
       |  FROM t GROUP BY lang)
       |SELECT e.lang, x.n_exact, e.occupied, e.reg_sum,
       |  $numer / CAST(e.reg_sum AS DOUBLE) AS hll_est
       |FROM est e JOIN exact x USING (lang) ORDER BY lang""".stripMargin
  }

  // ── q86: Count–Min heavy-hitter point queries — the counter grid is a
  // bounded d×w table (full map-side combine: 4096 rows out of any corpus
  // size); probes join it BROADCAST. The CMS overestimate guarantee
  // (cms_est ≥ n_exact) is deterministic here and verified row by row via
  // `over_by`. ───────────────────────────────────────────────────────────
  val CmsD = 4
  val CmsW = 1024
  /** Probe set: the stopword list, two corpus-frequent content words, and
    * one never-present word (exact 0 — only collisions can lift it). */
  val CmsProbes: Seq[String] =
    (Stopwords ++ Seq("table", "spark", "zz_never_seen")).distinct.sorted

  val q86_cms_heavy: Q = (s, d) => {
    import s.implicits._
    val t = toks(s, d).select($"tok")
    val counters = Sketches.cmsCounters(t, "tok", CmsD, CmsW)
    val probes = CmsProbes.toDF("word")
    val est = Sketches.cmsQuery(counters, probes, "word", CmsD, CmsW)
    val exact = probes.join(
        t.groupBy($"tok".as("word")).agg(count(lit(1)).as("__n")),
        Seq("word"), "left")
      .select($"word", coalesce($"__n", lit(0L)).as("n_exact"))
    exact.join(est, "word")
      .select($"word", $"n_exact", $"cms_est",
        ($"cms_est" - $"n_exact").as("over_by"))
      .orderBy($"word")
  }
  lazy val q86_sql: String = {
    val probeRows = CmsProbes.map(w => s"('$w')").mkString(", ")
    def pos(item: String, j: String) =
      s"('0x'||substr(md5('cms'||$j||'|'||$item),1,7))::BIGINT % $CmsW"
    s"""WITH t AS (
       |  SELECT unnest($SqlToks) AS tok FROM documents),
       |grid AS (
       |  SELECT j, pos, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT j.j AS j, ${pos("t.tok", "j.j")} AS pos
       |        FROM t, range($CmsD) j(j))
       |  GROUP BY j, pos),
       |probes(word) AS (VALUES $probeRows),
       |pp AS (
       |  SELECT word, j.j AS j, ${pos("word", "j.j")} AS pos
       |  FROM probes, range($CmsD) j(j)),
       |est AS (
       |  SELECT word, min(coalesce(g.cnt, 0)) AS cms_est
       |  FROM pp LEFT JOIN grid g USING (j, pos) GROUP BY word),
       |exact AS (
       |  SELECT p.word, CAST(coalesce(c.n, 0) AS BIGINT) AS n_exact
       |  FROM probes p LEFT JOIN
       |    (SELECT tok, count(*) AS n FROM t GROUP BY tok) c
       |    ON c.tok = p.word)
       |SELECT word, n_exact, cms_est, cms_est - n_exact AS over_by
       |FROM exact JOIN est USING (word) ORDER BY word""".stripMargin
  }

  // ── q113: histogram-quantile sketch — document-length percentiles
  // (p50/p90/p99 of n_chars) from bounded mergeable state: one count per
  // width-32 bucket, the truncation/packing sizing statistic a pipeline
  // wants without shuffling distinct values (q67's exact walk) at corpus
  // scale. The estimate bucket provably contains the exact type-1
  // quantile (error ≤ bucket width, spec-pinned); ranks and bucketing
  // are pure int64, so the oracle replays estimate AND error. ────────────
  val HistWidth = 32L
  val HistQuantiles = Seq((1L, 2L), (9L, 10L), (99L, 100L))

  val q113_hist_quantiles: Q = (s, d) => {
    import s.implicits._
    Sketches.histQuantiles(Tables.documents(s, d), "n_chars", HistWidth,
        HistQuantiles)
      .orderBy($"q_num".cast("double") / $"q_den")
  }
  lazy val q113_sql: String = {
    val targets = HistQuantiles
      .map { case (n, dn) => s"($n, $dn)" }.mkString(", ")
    s"""WITH hist AS (
       |  SELECT CAST(n_chars AS BIGINT) // $HistWidth AS bucket,
       |    count(*) AS cnt
       |  FROM documents GROUP BY 1),
       |cum AS (
       |  SELECT bucket, cnt,
       |    sum(cnt) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    (SELECT CAST(sum(cnt) AS BIGINT) FROM hist) AS n
       |  FROM hist),
       |t(q_num, q_den) AS (VALUES $targets),
       |hit AS (
       |  SELECT t.q_num, t.q_den, c.n,
       |    (t.q_num * c.n + t.q_den - 1) // t.q_den AS rank,
       |    min(c.bucket) AS bucket
       |  FROM cum c CROSS JOIN t
       |  WHERE c.cum >= (t.q_num * c.n + t.q_den - 1) // t.q_den
       |  GROUP BY 1, 2, 3, 4)
       |SELECT CAST(q_num AS BIGINT) AS q_num, CAST(q_den AS BIGINT) AS q_den,
       |  CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank,
       |  bucket, bucket * $HistWidth AS lo,
       |  bucket * $HistWidth + ${HistWidth - 1} AS hi
       |FROM hit ORDER BY CAST(q_num AS DOUBLE) / q_den""".stripMargin
  }

  // ── q115: KMV bottom-k overlap sketch — estimated distinct word-trigram
  // overlap between every language pair. The set-ALGEBRA sketch HLL (q85)
  // can't be: union sketches compose from sketch elements alone and
  // membership gives an intersection estimate — the "how much do these
  // two corpora overlap?" answer that drives cross-source dedup budgeting
  // without an all-pairs join. n_exact_inter rides along (q85 convention)
  // so the compare documents the estimator's error too. Scale shape: one
  // distinct-(lang, h) agg is the only corpus-sized stage; everything
  // after touches k·|langs| sketch rows. ─────────────────────────────────
  val KmvK = 128
  val KmvGramN = 3
  /** Estimator numerator (k−1)·2^28 — ONE Scala double interpolated into
    * both engines (q85's `numer` convention). */
  private val KmvNumer = (KmvK - 1).toDouble * (1L << 28)

  /** Per-doc distinct trigram hashes (lang, h) — the fused
    * WordShingleHashes kernel (one codegen'd pass: tokenize, shingle,
    * md5-prefix, per-doc distinct) instead of materializing gram STRINGS
    * through an explode and hashing them separately; property-tested
    * value-identical to hash28 ∘ shingles. */
  private def kmvGramHashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    Tables.documents(s, d).select($"lang",
      explode(columnOf(graft.plans.WordShingleHashes(
        expressionOf($"text"), KmvGramN, 7))).as("h"))
  }

  val q115_kmv_overlap: Q = (s, d) => {
    import s.implicits._
    // Hash grams at scan time and distinct the (lang, h) pairs ONCE,
    // persisted: gram strings never shuffle (int64 only past the scan),
    // and the sketch AND both sides of the exact-intersection join read
    // the same frame — unpersisted, each reference would re-run the
    // tokenize+explode scan. The exact comparison lives in the hash
    // universe on purpose: KMV estimates DISTINCT-HASH cardinality, so
    // distinct-hash intersection is the quantity its error should be
    // judged against.
    val dv = graft.operators.OperatorCaches.register(
      kmvGramHashes(s, d).distinct().persist())
    val sk = Sketches.kmvSketchOfHashes(dv, Seq("lang"), KmvK)
    val est = Sketches.kmvPairOverlap(sk, "lang", KmvK)
    val exact = dv.as("a").join(dv.as("b"),
        $"a.h" === $"b.h" && $"a.lang" < $"b.lang")
      .groupBy($"a.lang".as("g_a"), $"b.lang".as("g_b"))
      .agg(count(lit(1)).as("n_exact_inter"))
    est.join(exact, Seq("g_a", "g_b"), "left")
      .select($"g_a".as("lang_a"), $"g_b".as("lang_b"), $"n_kept",
        $"kth_hash", $"n_common",
        coalesce($"n_exact_inter", lit(0L)).as("n_exact_inter"),
        $"est_union", $"est_inter")
      .orderBy($"lang_a", $"lang_b")
  }
  lazy val q115_sql: String = {
    // mirror of TextFunctions.shingles(n=3): windows i..i+2 over the raw
    // token list (range excludes its end, so len(t)-1 ≡ Spark's guard)
    val grams = s"""list_transform(range(1, len(t) - ${KmvGramN - 2}),
       i -> array_to_string(t[i:i+${KmvGramN - 1}], ' '))"""
    s"""WITH toks AS (
       |  SELECT lang, string_split_regex(lower(text), '\\s+') AS t
       |  FROM documents),
       |grams AS (SELECT lang, unnest($grams) AS g FROM toks),
       |dv AS (
       |  SELECT DISTINCT lang, ('0x'||substr(md5(g),1,7))::BIGINT AS h
       |  FROM grams),
       |sk AS (
       |  SELECT lang, h FROM (
       |    SELECT lang, h, row_number() OVER (PARTITION BY lang
       |      ORDER BY h) AS rk FROM dv)
       |  WHERE rk <= $KmvK),
       |langs AS (SELECT DISTINCT lang FROM sk),
       |pairs AS (
       |  SELECT a.lang AS g_a, b.lang AS g_b
       |  FROM langs a JOIN langs b ON a.lang < b.lang),
       |uv AS (
       |  SELECT p.g_a, p.g_b, s.h,
       |    max(s.lang = p.g_a) AS in_a, max(s.lang = p.g_b) AS in_b
       |  FROM pairs p JOIN sk s ON s.lang = p.g_a OR s.lang = p.g_b
       |  GROUP BY 1, 2, 3),
       |kept AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY g_a, g_b
       |      ORDER BY h) AS rk FROM uv)
       |  WHERE rk <= $KmvK),
       |agg AS (
       |  SELECT g_a, g_b, count(*) AS n_kept, max(h) AS kth_hash,
       |    CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_common
       |  FROM kept GROUP BY 1, 2),
       |exact AS (
       |  SELECT a.lang AS g_a, b.lang AS g_b, count(*) AS n_exact_inter
       |  FROM dv a JOIN dv b ON a.h = b.h AND a.lang < b.lang
       |  GROUP BY 1, 2)
       |SELECT g_a AS lang_a, g_b AS lang_b, n_kept, kth_hash, n_common,
       |  CAST(coalesce(e.n_exact_inter, 0) AS BIGINT) AS n_exact_inter,
       |  CASE WHEN n_kept < $KmvK THEN CAST(n_kept AS DOUBLE)
       |       ELSE $KmvNumer / CAST(kth_hash AS DOUBLE) END AS est_union,
       |  (CASE WHEN n_kept < $KmvK THEN CAST(n_kept AS DOUBLE)
       |        ELSE $KmvNumer / CAST(kth_hash AS DOUBLE) END)
       |    * (CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE))
       |    AS est_inter
       |FROM agg LEFT JOIN exact e USING (g_a, g_b)
       |ORDER BY lang_a, lang_b""".stripMargin
  }

  // ── q121: per-GROUP histogram quantiles — q113's sketch partitioned by
  // language in ONE pass (Sketches.histQuantilesBy): per-lang p50/p90/p99
  // of document length without splitting the corpus into per-group jobs.
  // The cumulative window partitions by lang and still runs over bucket
  // rows only (bounded per group); per-group totals are a window sum, not
  // a join. Same pure-int64 rank/bucket math, so the oracle replays every
  // group's estimate and its quantization error. ─────────────────────────
  val q121_grouped_quantiles: Q = (s, d) => {
    import s.implicits._
    Sketches.histQuantilesBy(Tables.documents(s, d), Seq("lang"), "n_chars",
        HistWidth, HistQuantiles)
      .orderBy($"lang", $"q_num".cast("double") / $"q_den")
  }
  lazy val q121_sql: String = {
    val targets = HistQuantiles
      .map { case (n, dn) => s"($n, $dn)" }.mkString(", ")
    s"""WITH hist AS (
       |  SELECT lang, CAST(n_chars AS BIGINT) // $HistWidth AS bucket,
       |    count(*) AS cnt
       |  FROM documents GROUP BY 1, 2),
       |cum AS (
       |  SELECT lang, bucket, cnt,
       |    sum(cnt) OVER (PARTITION BY lang ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(cnt) OVER (PARTITION BY lang) AS n
       |  FROM hist),
       |t(q_num, q_den) AS (VALUES $targets),
       |hit AS (
       |  SELECT c.lang, t.q_num, t.q_den, c.n,
       |    (t.q_num * c.n + t.q_den - 1) // t.q_den AS rank,
       |    min(c.bucket) AS bucket
       |  FROM cum c CROSS JOIN t
       |  WHERE c.cum >= (t.q_num * c.n + t.q_den - 1) // t.q_den
       |  GROUP BY 1, 2, 3, 4, 5)
       |SELECT lang, CAST(q_num AS BIGINT) AS q_num,
       |  CAST(q_den AS BIGINT) AS q_den,
       |  CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank,
       |  bucket, bucket * $HistWidth AS lo,
       |  bucket * $HistWidth + ${HistWidth - 1} AS hi
       |FROM hit ORDER BY lang, CAST(q_num AS DOUBLE) / q_den""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q85_hll_vocab" -> q85_hll_vocab,
    "q86_cms_heavy" -> q86_cms_heavy,
    "q113_hist_quantiles" -> q113_hist_quantiles,
    "q115_kmv_overlap" -> q115_kmv_overlap,
    "q121_grouped_quantiles" -> q121_grouped_quantiles,
  )
  val oracleSql: Map[String, String] = Map(
    "q85_hll_vocab" -> q85_sql,
    "q86_cms_heavy" -> q86_sql,
    "q113_hist_quantiles" -> q113_sql,
    "q115_kmv_overlap" -> q115_sql,
    "q121_grouped_quantiles" -> q121_sql,
  )
}
