package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Sampling

/** Text-analysis operators over the `documents` table (training-pipeline
  * extensions mandated by BASELINE.json). Each is a pure column pipeline —
  * scan-speed at 100 TB, no shuffle except the final presentation sort.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  // ── token counting: whitespace + BPE-ish regex ──────────────────────────
  val q17_token_count: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        size(tokens($"text")).as("ws_tokens"),
        bpeishTokenCount($"text").as("bpeish_tokens"))
      .orderBy($"doc_id")
  }
  val q17_sql: String =
    s"""SELECT doc_id,
       |  len(string_split_regex(lower(text), '\\s+')) AS ws_tokens,
       |  len(regexp_extract_all(lower(text), '$BpeishPattern')) AS bpeish_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  // ── quality scoring: stopword / punctuation ratios, mean token length ──
  val q18_quality: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        stopwordHits($"text").as("stop_hits"),
        punctChars($"text").as("punct_chars"),
        meanTokenLen($"text").as("mean_tok_len"),
        qualityScore($"text").as("quality"))
      .orderBy($"doc_id")
  }
  val q18_sql: String = {
    val stops = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  len(list_filter(string_split_regex(lower(text), '\\s+'),
       |      t -> t IN ($stops))) AS stop_hits,
       |  length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS punct_chars,
       |  CAST(list_sum(list_transform(string_split_regex(lower(text), '\\s+'),
       |      t -> length(t))) AS DOUBLE)
       |    / len(string_split_regex(lower(text), '\\s+')) AS mean_tok_len,
       |  $qualitySqlExpr AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ── language ID: marker-token scoring, argmax with fixed tie order ──────
  val q19_lang_id: Q = (s, d) => {
    import s.implicits._
    val hitCols = LangMarkers.map { case (l, _) =>
      langHits($"text", l).as(s"hits_$l")
    }
    Tables.documents(s, d)
      .select(($"doc_id" +: hitCols :+ langId($"text").as("pred_lang")): _*)
      .orderBy($"doc_id")
  }
  val q19_sql: String = {
    def hits(l: String): String = {
      val ms = LangMarkers.toMap.apply(l).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN ($ms)))"
    }
    val langs = LangMarkers.map(_._1)
    val hitSel = langs.map(l => s"  ${hits(l)} AS hits_$l").mkString(",\n")
    // CASE chain mirrors TextFunctions.langId tie-break order exactly.
    val caseChain = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
      val conds = rest.map(r => s"hits_$l >= hits_$r").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, ${langs.map(l => s"hits_$l").mkString(", ")},
       |  CASE $caseChain ELSE '${langs.last}' END AS pred_lang
       |FROM (SELECT doc_id, text,
       |$hitSel
       |FROM documents) ORDER BY doc_id""".stripMargin
  }

  // ── document fingerprinting: normalized md5 ─────────────────────────────
  val q20_fingerprint: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", fingerprint($"text").as("fp"))
      .orderBy($"doc_id")
  }
  val q20_sql: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // DuckDB fragment computing the same quality double as
  // TextFunctions.qualityScore (shared by q18 and q56 — the doubles are
  // hash-compared, so the arithmetic must be replicated term for term).
  private[queries] def qualitySqlExpr: String = {
    val stops = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""0.5 * (CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
       |      t -> t IN ($stops))) AS DOUBLE)
       |         / len(string_split_regex(lower(text), '\\s+')))
       |  + 0.5 * (1.0 - CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
       |           / length(text))""".stripMargin
  }

  // ── q55: deterministic dataset split. Each document's train/val/test
  // assignment is pure id-hash math (Sampling.hashSplit): reproducible
  // across reruns/engines, stable under corpus growth, zero shuffle before
  // the presentation agg. The oracle replicates the md5 bucket arithmetic,
  // hash-verifying every row's assignment through the per-split counts. ──
  val q55_dataset_split: Q = (s, d) => {
    import s.implicits._
    Sampling.hashSplit(Tables.documents(s, d), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n"))
      .orderBy($"split", $"lang")
  }
  val q55_sql: String =
    """SELECT CASE WHEN b < 8000 THEN 'train'
      |            WHEN b < 9000 THEN 'val'
      |            ELSE 'test' END AS split,
      |  lang, count(*) AS n
      |FROM (SELECT lang,
      |        ('0x'||substr(md5('split' || CAST(doc_id AS VARCHAR)),1,7))::BIGINT
      |          % 10000 AS b
      |      FROM documents)
      |GROUP BY split, lang
      |ORDER BY split, lang""".stripMargin

  // ── q56: stratified quota curation — best 3 documents per language by
  // quality score (Sampling.stratifiedQuota): one shuffle on the stratum
  // key, per-stratum window sort, no global sort. ─────────────────────────
  val q56_stratified_quota: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", $"lang", qualityScore($"text").as("quality"))
    Sampling.stratifiedQuota(docs, "lang", "quality", "doc_id", k = 3)
      .orderBy($"lang", $"quality".desc, $"doc_id")
  }
  val q56_sql: String =
    s"""SELECT doc_id, lang, quality FROM (
       |  SELECT doc_id, lang, quality,
       |    row_number() OVER (PARTITION BY lang
       |                       ORDER BY quality DESC, doc_id) AS rnk
       |  FROM (SELECT doc_id, lang, $qualitySqlExpr AS quality
       |        FROM documents))
       |WHERE rnk <= 3
       |ORDER BY lang, quality DESC, doc_id""".stripMargin

  // ── q57: document chunking — overlapping 120-char windows stepping by
  // 100 (Chunking.chunkChars): sequence+explode+substr, all codegen, scan-
  // shaped fan-out. The oracle rebuilds every (doc, chunk_start, chunk)
  // triple with an arithmetic range join, hash-verifying window placement
  // and substring extraction. ─────────────────────────────────────────────
  val q57_chunking: Q = (s, d) => {
    import s.implicits._
    graft.operators.Chunking.chunkChars(
        Tables.documents(s, d).select($"doc_id", $"text"),
        "text", size = 120, overlap = 20)
      .select($"doc_id", $"chunk_start", $"chunk")
      .orderBy($"doc_id", $"chunk_start")
  }
  // chunk-start universe derived from the corpus (scalar range(): the
  // table function can't take a subquery bound) — no hardcoded length cap
  val q57_sql: String =
    """WITH starts AS (
      |  SELECT unnest(range(0,
      |    (SELECT max(length(text)) + 100 FROM documents), 100)) AS i)
      |SELECT doc_id, CAST(s.i AS INT) AS chunk_start,
      |  substr(text, CAST(s.i AS INT) + 1, 120) AS chunk
      |FROM documents, starts s
      |WHERE s.i < length(text)
      |ORDER BY doc_id, chunk_start""".stripMargin

  // ── q60: corpus rebalancing — deterministic fractional upsampling per
  // language (Sampling.rebalance): de ×2.5, fr ×0.5, everything else ×1.
  // Expected multiplicity is exactly the weight; per-row multiplicity is
  // reproducible hash math the oracle replicates, so every copy count is
  // hash-verified through the per-language totals AND the per-row copy
  // indices (max copy_idx per doc). ────────────────────────────────────────
  val q60_rebalance: Q = (s, d) => {
    import s.implicits._
    Sampling.rebalance(Tables.documents(s, d), "lang", "doc_id",
        Map("de" -> 2.5, "fr" -> 0.5))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_rows"),
           countDistinct($"doc_id").as("n_docs"),
           max($"copy_idx").cast("bigint").as("max_copy"))
      .orderBy($"lang")
  }
  val q60_sql: String =
    """WITH c AS (
      |  SELECT doc_id, lang,
      |    (CASE lang WHEN 'de' THEN 2 WHEN 'fr' THEN 0 ELSE 1 END)
      |    + (CASE WHEN ('0x'||substr(md5('rebalance' || CAST(doc_id AS VARCHAR)),1,7))::BIGINT % 10000
      |            < (CASE lang WHEN 'de' THEN 5000 WHEN 'fr' THEN 5000 ELSE 0 END)
      |       THEN 1 ELSE 0 END) AS copies
      |  FROM documents)
      |SELECT lang, CAST(sum(copies) AS BIGINT) AS n_rows,
      |  count(DISTINCT CASE WHEN copies > 0 THEN doc_id END) AS n_docs,
      |  max(copies - 1)::BIGINT AS max_copy
      |FROM c GROUP BY lang ORDER BY lang""".stripMargin

  // ── q63: PII detection + redaction. The synthetic corpus carries no PII,
  // so both engines first enrich a deterministic doc_id-keyed subset with
  // emails / IPv4s / phone numbers, then count and redact them — the check
  // is that two independent regex engines (Java, RE2) agree on every match
  // boundary. Scan-speed column pipeline, no shuffle, no UDFs. ────────────
  val q63_pii_redact: Q = (s, d) => {
    import s.implicits._
    val id = $"doc_id".cast(StringType)
    val enriched = Tables.documents(s, d).withColumn("text2", concat(
      $"text",
      when($"doc_id" % 3 === 0,
        concat(lit(" contact user"), id, lit("@example.org"))).otherwise(lit("")),
      when($"doc_id" % 5 === 0,
        concat(lit(" host 10.0."), ($"doc_id" % 256).cast(StringType),
          lit("."), ($"doc_id" % 100).cast(StringType))).otherwise(lit("")),
      when($"doc_id" % 7 === 0,
        concat(lit(" call +1-555-"),
          lpad(($"doc_id" % 10000).cast(StringType), 4, "0"))).otherwise(lit(""))))
    enriched.select($"doc_id",
        emailCount($"text2").as("n_emails"),
        ipv4Count($"text2").as("n_ips"),
        phoneCount($"text2").as("n_phones"),
        md5(redactPii($"text2").cast(BinaryType)).as("redacted_fp"))
      .orderBy($"doc_id")
  }
  val q63_sql: String = {
    val redacted =
      s"""regexp_replace(regexp_replace(regexp_replace(text2,
         |    '$EmailPattern', '<EMAIL>', 'g'),
         |    '$Ipv4Pattern', '<IP>', 'g'),
         |    '$PhonePattern', '<PHONE>', 'g')""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
       |         || CAST(doc_id AS VARCHAR) || '@example.org' ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.'
       |         || CAST(doc_id % 256 AS VARCHAR) || '.'
       |         || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0 THEN ' call +1-555-'
       |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
       |    AS text2
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(text2, '$EmailPattern')) AS n_emails,
       |  len(regexp_extract_all(text2, '$Ipv4Pattern')) AS n_ips,
       |  len(regexp_extract_all(text2, '$PhonePattern')) AS n_phones,
       |  md5($redacted) AS redacted_fp
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // ── q64: Gopher-style repetition filters — duplicate-word fraction, top-
  // word fraction, duplicate-bigram fraction per document. ZERO-shuffle:
  // an explode→groupBy formulation would shuffle every (doc, token) pair
  // — a corpus-sized shuffle at 100 TB — so all five counts come from the
  // native one-pass graft.plans.TokenStats kernel inside the scan. The
  // oracle derives the same numbers independently via list functions +
  // per-term filters. Fractions are exact int/int divisions so the
  // doubles are bit-identical across engines. ─────────────────────────────
  val q64_repetition: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    // all five counts in ONE native pass (graft.plans.TokenStats): the
    // interpreted HOF formulation (array_sort + struct fold + two
    // array_distinct walks) measured 2-4x slower at sf0.1, and an
    // explode+groupBy formulation would shuffle every (doc, token) pair —
    // a corpus-sized shuffle at 100 TB
    Tables.documents(s, d)
      .select($"doc_id",
        columnOf(graft.plans.TokenStats(expressionOf($"text"))).as("st"))
      .select($"doc_id",
        $"st.n_words".as("n_words"),
        $"st.n_distinct_words".as("n_distinct_words"),
        $"st.top_word_n".as("top_word_n"),
        $"st.n_bigrams".as("n_bigrams"),
        $"st.n_distinct_bigrams".as("n_distinct_bigrams"))
      .select($"doc_id", $"n_words", $"n_distinct_words", $"top_word_n",
        $"n_bigrams", $"n_distinct_bigrams",
        (lit(1.0) - $"n_distinct_words".cast(DoubleType) / $"n_words")
          .as("dup_word_frac"),
        ($"top_word_n".cast(DoubleType) / $"n_words").as("top_word_frac"),
        when($"n_bigrams" > 0L,
          lit(1.0) - $"n_distinct_bigrams".cast(DoubleType) / $"n_bigrams")
          .as("dup_bigram_frac"))
      .orderBy($"doc_id")
  }
  val q64_sql: String = {
    val toks = "string_split_regex(lower(text), '\\s+')"
    val grams = s"list_transform(range(1, len($toks)), " +
      s"i -> array_to_string(($toks)[i:i+1], ' '))"
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks, $grams AS grams FROM documents),
       |a AS (
       |  SELECT doc_id,
       |    len(toks) AS n_words,
       |    len(list_distinct(toks)) AS n_distinct_words,
       |    CAST(list_max(list_transform(list_distinct(toks),
       |      t -> len(list_filter(toks, x -> x = t)))) AS BIGINT) AS top_word_n,
       |    len(grams) AS n_bigrams,
       |    len(list_distinct(grams)) AS n_distinct_bigrams
       |  FROM t)
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(n_distinct_words AS BIGINT) AS n_distinct_words, top_word_n,
       |  CAST(n_bigrams AS BIGINT) AS n_bigrams,
       |  CAST(n_distinct_bigrams AS BIGINT) AS n_distinct_bigrams,
       |  1.0 - CAST(n_distinct_words AS DOUBLE) / n_words AS dup_word_frac,
       |  CAST(top_word_n AS DOUBLE) / n_words AS top_word_frac,
       |  CASE WHEN n_bigrams > 0 THEN
       |    1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams
       |  ELSE NULL END AS dup_bigram_frac
       |FROM a ORDER BY doc_id""".stripMargin
  }

  // ── q65: TF-IDF keyword extraction — top-3 terms per document. The idf
  // is the RATIONAL variant (N+1)/(df+1) rather than its log: log is
  // transcendental and its last ULP differs between libm (DuckDB) and the
  // JVM, which would break hash-exact oracle comparison; the rational form
  // is one IEEE multiply + divide, bit-identical in both engines. Shape:
  // explode → (doc, term) tf agg → term df agg → join → per-doc top-k
  // window. The df side is vocabulary-sized, so AQE broadcasts it when
  // small and shuffles both sides at corpus scale. ────────────────────────
  val q65_tfidf: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    // N rides along as a 1-row aggregate cross join (broadcast nested
    // loop) — a driver-side docs.count() would be a second full corpus
    // scan before the plan even runs
    val nDf = docs.agg(count(lit(1)).as("n_total"))
    val tf = docs.select($"doc_id", explode(tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term".asc)
    tf.join(df, "term").crossJoin(nDf)
      .withColumn("score",
        $"tf".cast(DoubleType) * ($"n_total" + 1L).cast(DoubleType) /
          ($"df" + 1L).cast(DoubleType))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where($"rank" <= 3)
      .select($"doc_id", $"rank", $"term", $"tf", $"df", $"score")
      .orderBy($"doc_id", $"rank")
  }
  val q65_sql: String = {
    val toks = "string_split_regex(lower(text), '\\s+')"
    s"""WITH tf AS (
       |  SELECT doc_id, t AS term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest($toks) AS t FROM documents)
       |  GROUP BY doc_id, t),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT count(*) AS n FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    CAST(tf.tf AS DOUBLE) * CAST(n.n + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE) AS score
       |  FROM tf JOIN df USING (term), n),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, term ASC) AS rank FROM scored)
       |SELECT doc_id, rank, term, tf, df, score FROM ranked
       |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
  }

  // ── q68: token-budget sequence packing — docs → fixed-budget training
  // shards per source, via Packing.packShards' two-level distributed
  // prefix sum (bucketSize 64 forces the multi-bucket path even at
  // sf0.01). The oracle computes the same offsets with a plain global
  // window cumsum — an independent derivation of every shard boundary. ───
  val q68_pack_shards: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"source", $"doc_id", size(tokens($"text")).cast(LongType).as("w"))
    graft.operators.Packing.packShards(docs, "source", "doc_id", "w",
        budget = 1000L, bucketSize = 64L)
      .groupBy($"source", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"w").as("shard_tokens"))
      .orderBy($"source", $"shard")
  }
  val q68_sql: String = {
    val toks = "len(string_split_regex(lower(text), '\\s+'))"
    s"""WITH t AS (
       |  SELECT source, doc_id, $toks AS w FROM documents),
       |c AS (
       |  SELECT source, doc_id, w,
       |    sum(w) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT source, CAST((cum - w) // 1000 AS BIGINT) AS shard,
       |  count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS shard_tokens
       |FROM c GROUP BY source, shard ORDER BY source, shard""".stripMargin
  }

  // ── q76: packed-sequence materialization — q68's shard assignment
  // realized as actual training sequences: the documents of each shard
  // concatenated in pack order with an <eos> separator. The concat order
  // is pinned by sort_array over (doc_id, text) structs (collect_list
  // alone is arrival-ordered, i.e. nondeterministic), and the md5
  // fingerprint of every shard's full sequence is what the oracle
  // compares — any document in the wrong shard or position changes it. ────
  val q76_pack_sequences: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"source", $"doc_id", $"text",
        size(tokens($"text")).cast(LongType).as("w"))
    // collect ONCE per group (the aggregation buffer holds the shard's
    // texts — two aggregate columns over the same expression would hold
    // and sort two copies), then derive length + fingerprint in a
    // follow-up projection
    graft.operators.Packing.packShards(docs, "source", "doc_id", "w",
        budget = 1000L, bucketSize = 64L)
      .groupBy($"source", $"shard")
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(struct($"doc_id", $"text"))).as("parts"))
      .withColumn("seq",
        array_join(transform($"parts", e => e.getField("text")), "<eos>"))
      .select($"source", $"shard", $"n_docs",
        length($"seq").cast(LongType).as("seq_chars"),
        md5($"seq".cast(BinaryType)).as("seq_fp"))
      .orderBy($"source", $"shard")
  }
  val q76_sql: String = {
    val toks = "len(string_split_regex(lower(text), '\\s+'))"
    s"""WITH t AS (
       |  SELECT source, doc_id, text, $toks AS w FROM documents),
       |c AS (
       |  SELECT source, doc_id, text, w,
       |    sum(w) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT source, CAST((cum - w) // 1000 AS BIGINT) AS shard,
       |  count(*) AS n_docs,
       |  length(string_agg(text, '<eos>' ORDER BY doc_id)) AS seq_chars,
       |  md5(string_agg(text, '<eos>' ORDER BY doc_id)) AS seq_fp
       |FROM c GROUP BY source, shard ORDER BY source, shard""".stripMargin
  }

  // ── q78: model-based quality filtering — a hashed-feature linear
  // classifier (fastText-style) scored at scan speed. Tokens hash into 64
  // feature slots via the portable 28-bit hash; the integer slot weights
  // are an affine mix both engines derive identically, so the score — and
  // therefore the keep/drop verdict — is exact int64 and hash-verifiable.
  // Zero shuffle: per-row fused hash kernel + integer fold. ───────────────
  val q78_classifier_score: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        hashedFeatureCount($"text").as("n_feats"),
        hashedLinearScore($"text").as("score"))
      .withColumn("keep", $"score" > 0L)
      .orderBy($"doc_id")
  }
  val q78_sql: String = {
    val toks = "list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)"
    def score(t: String) =
      s"""CAST(coalesce(list_sum(list_transform($t,
         |    t -> ((('0x'||substr(md5(t),1,7))::BIGINT % 64) * 7919) % 21 - 10)), 0) AS BIGINT)""".stripMargin
    s"""SELECT doc_id, len($toks) AS n_feats,
       |  ${score(toks)} AS score,
       |  ${score(toks)} > 0 AS keep
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ── q81: temperature-weighted domain mixing — per-source sampling
  // weights ∝ sqrt(n) (α = 1/2), the classic size-tempering of
  // multi-source training mixes. sqrt(n) is quantized to an exact scaled
  // int64 BEFORE the denominator sum (Sampling.temperatureWeights), so
  // the weights and integer targets hash-compare bit-for-bit — no
  // addition-order dependence. ───────────────────────────────────────────
  val MixBudget = 1000L

  val q81_temperature_mix: Q = (s, d) => {
    import s.implicits._
    Sampling.temperatureWeights(Tables.documents(s, d), "source", MixBudget)
      .orderBy($"source")
  }
  val q81_sql: String =
    s"""WITH c AS (
       |  SELECT source, count(*) AS n FROM documents GROUP BY source),
       |w AS (
       |  SELECT source, n,
       |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576.0) AS BIGINT)
       |      AS w_scaled
       |  FROM c),
       |t AS (
       |  SELECT source, n, w_scaled,
       |    CAST(w_scaled AS DOUBLE)
       |      / CAST((SELECT CAST(sum(w_scaled) AS BIGINT) FROM w) AS DOUBLE)
       |      AS weight
       |  FROM w)
       |SELECT source, n, w_scaled, weight,
       |  CAST(floor(weight * $MixBudget) AS BIGINT) AS target_n
       |FROM t ORDER BY source""".stripMargin

  // ── q82: token-budget corpus selection — "take the best documents until
  // the token budget is spent". Quality is quantized to a scaled int64
  // sort key (engine-exact ordering); the running token total is the
  // banded two-level prefix sum of Sampling.budgetSelect, never one
  // global window. The oracle replays the same walk with a plain window
  // (oracle scale is small), hash-verifying every keep decision and every
  // running total. ──────────────────────────────────────────────────────
  val TokenBudget = 8000L

  val q82_budget_select: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id",
      floor(qualityScore($"text") * (1L << 20)).cast("long").as("qs"),
      size(tokens($"text")).cast("long").as("n_toks"))
    Sampling.budgetSelect(docs, "qs", "doc_id", "n_toks", TokenBudget)
      .orderBy($"doc_id")
  }
  val q82_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(floor(($qualitySqlExpr) * 1048576.0) AS BIGINT) AS qs,
       |    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
       |      AS n_toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, qs, n_toks,
       |    CAST(sum(n_toks) OVER (ORDER BY qs DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n_toks
       |  FROM t)
       |SELECT doc_id, qs, n_toks, cum_n_toks
       |FROM c WHERE cum_n_toks <= $TokenBudget ORDER BY doc_id""".stripMargin

  // ── q120: quality-tier sampling — the CCNet-style head/middle/tail
  // curation pass (Sampling.histTierSample): docs split into thirds at
  // the histogram-sketch quantiles of the integer-scaled q18 quality
  // score, then hash-sampled per tier (tail 10%, middle 50%, head 100%).
  // Where q82's budget select takes best-first until a budget, this KEEPS
  // corpus diversity by retaining a controlled slice of every quality
  // band. Scale shape: the cuts come from the bounded histogram sketch
  // (never a corpus sort or global window); membership + sampling are
  // per-row column math against one broadcast cut row; the output agg is
  // bounded by tiers × langs. ────────────────────────────────────────────
  val TierScale = 1L << 20
  val TierWidth = 16384L // 64 buckets over the [0, 2^20] score range
  val TierKeepPct = Seq(10, 50, 100)

  val q120_quality_tier_sample: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.types.LongType
    // the regex-heavy quality expression feeds BOTH the histogram-cut
    // subtree and the per-row tier assignment — persist the scored frame
    // so the corpus scan computes it once
    val scored = graft.operators.OperatorCaches.register(
      Tables.documents(s, d).select($"doc_id", $"lang", $"n_chars",
        floor(qualityScore($"text") * TierScale).cast(LongType).as("qs"))
        .persist())
    Sampling.histTierSample(scored, "qs", "doc_id", TierWidth, TierKeepPct,
        salt = "qtier")
      .groupBy($"tier", $"lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"kept", $"n_chars").otherwise(0L)).as("kept_chars"))
      .orderBy($"tier", $"lang")
  }
  lazy val q120_sql: String = {
    val nTiers = TierKeepPct.size
    val targets = (1 until nTiers).map(i => s"($i, $nTiers)").mkString(", ")
    val rateCase = TierKeepPct.init.zipWithIndex
      .map { case (p, i) => s"WHEN $i THEN $p" }.mkString(" ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang, n_chars,
       |    CAST(floor(($qualitySqlExpr) * $TierScale) AS BIGINT) AS qs
       |  FROM documents),
       |hist AS (SELECT qs // $TierWidth AS bucket, count(*) AS cnt
       |         FROM scored GROUP BY 1),
       |cum AS (
       |  SELECT bucket, cnt,
       |    sum(cnt) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    (SELECT CAST(sum(cnt) AS BIGINT) FROM hist) AS n
       |  FROM hist),
       |t(q_num, q_den) AS (VALUES $targets),
       |hit AS (
       |  SELECT t.q_num, min(c.bucket) AS bucket
       |  FROM cum c CROSS JOIN t
       |  WHERE c.cum >= (t.q_num * c.n + t.q_den - 1) // t.q_den
       |  GROUP BY t.q_num),
       |cuts AS (
       |  SELECT list_sort(list(bucket * $TierWidth + ${TierWidth - 1}))
       |    AS cs FROM hit),
       |tiers AS (
       |  SELECT s.*, len(list_filter(c.cs, x -> x < s.qs)) AS tier,
       |    ('0x'||substr(md5('qtier' || CAST(s.doc_id AS VARCHAR)),1,7))::BIGINT
       |      % 100 AS h
       |  FROM scored s CROSS JOIN cuts c),
       |flagged AS (
       |  SELECT tier, lang, n_chars,
       |    h < CASE tier $rateCase ELSE ${TierKeepPct.last} END AS kept
       |  FROM tiers)
       |SELECT CAST(tier AS BIGINT) AS tier, lang, count(*) AS n_total,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT)
       |    AS kept_chars
       |FROM flagged GROUP BY 1, 2 ORDER BY tier, lang""".stripMargin
  }

  // ── q128: per-language percentile normalization — the rank transform
  // that makes quality thresholds comparable ACROSS languages (a 0.6 in
  // one language's score distribution is a 0.9 in another's): each doc
  // gets its within-lang percentile from the bounded histogram, pct =
  // rows-in-strictly-lower-buckets · 2^20 div n — bucket-resolution
  // (error ≤ bucket width), pure int64, deterministic. The fine-grained
  // sibling of q120's three-tier cut. Scale shape: the per-lang cum
  // windows run over BUCKET rows (bounded); the per-row lookup is a
  // broadcast join on (lang, bucket); never a corpus-row window or sort
  // before the presentation ORDER BY. ────────────────────────────────────
  val q128_quality_percentile: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val W = org.apache.spark.sql.types.LongType
    val withB = graft.operators.OperatorCaches.register(
      Tables.documents(s, d).select($"doc_id", $"lang",
          floor(qualityScore($"text") * TierScale).cast(W).as("qs"))
        .withColumn("bucket", expr(s"qs div $TierWidth"))
        .persist())
    val hist = withB.groupBy($"lang", $"bucket").agg(count(lit(1)).as("cnt"))
    val cums = hist
      .withColumn("cum", sum($"cnt").over(Window.partitionBy($"lang")
        .orderBy($"bucket").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"lang")))
    withB.join(broadcast(cums.select($"lang", $"bucket",
        ($"cum" - $"cnt").as("below"), $"n")), Seq("lang", "bucket"))
      .withColumn("pct", expr(s"below * $TierScale div n"))
      .select($"doc_id", $"lang", $"qs", $"pct")
      .orderBy($"doc_id")
  }
  lazy val q128_sql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    CAST(floor(($qualitySqlExpr) * $TierScale) AS BIGINT) AS qs
       |  FROM documents),
       |wb AS (
       |  SELECT doc_id, lang, qs, qs // $TierWidth AS bucket FROM scored),
       |hist AS (
       |  SELECT lang, bucket, count(*) AS cnt FROM wb GROUP BY 1, 2),
       |cums AS (
       |  SELECT lang, bucket, cnt,
       |    sum(cnt) OVER (PARTITION BY lang ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(cnt) OVER (PARTITION BY lang) AS n
       |  FROM hist)
       |SELECT w.doc_id, w.lang, w.qs,
       |  CAST((c.cum - c.cnt) * $TierScale // c.n AS BIGINT) AS pct
       |FROM wb w JOIN cums c USING (lang, bucket)
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q17_token_count" -> q17_token_count,
    "q18_quality" -> q18_quality,
    "q19_lang_id" -> q19_lang_id,
    "q20_fingerprint" -> q20_fingerprint,
    "q55_dataset_split" -> q55_dataset_split,
    "q56_stratified_quota" -> q56_stratified_quota,
    "q57_chunking" -> q57_chunking,
    "q60_rebalance" -> q60_rebalance,
    "q63_pii_redact" -> q63_pii_redact,
    "q64_repetition" -> q64_repetition,
    "q65_tfidf" -> q65_tfidf,
    "q68_pack_shards" -> q68_pack_shards,
    "q76_pack_sequences" -> q76_pack_sequences,
    "q78_classifier_score" -> q78_classifier_score,
    "q81_temperature_mix" -> q81_temperature_mix,
    "q82_budget_select" -> q82_budget_select,
    "q120_quality_tier_sample" -> q120_quality_tier_sample,
    "q128_quality_percentile" -> q128_quality_percentile,
  )
  val oracleSql: Map[String, String] = Map(
    "q17_token_count" -> q17_sql,
    "q18_quality" -> q18_sql,
    "q19_lang_id" -> q19_sql,
    "q20_fingerprint" -> q20_sql,
    "q55_dataset_split" -> q55_sql,
    "q56_stratified_quota" -> q56_sql,
    "q57_chunking" -> q57_sql,
    "q60_rebalance" -> q60_sql,
    "q63_pii_redact" -> q63_sql,
    "q64_repetition" -> q64_sql,
    "q65_tfidf" -> q65_sql,
    "q68_pack_shards" -> q68_sql,
    "q76_pack_sequences" -> q76_sql,
    "q78_classifier_score" -> q78_sql,
    "q81_temperature_mix" -> q81_sql,
    "q82_budget_select" -> q82_sql,
    "q120_quality_tier_sample" -> q120_sql,
    "q128_quality_percentile" -> q128_sql,
  )
}
