package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.operators.{Bpe, Dedup, OperatorCaches, Packing, Sampling}

/** q109: the composed end-to-end curation pipeline — the chain a real
  * training-data build runs, as ONE oracle-checked query:
  *
  *   exact dedup (q21) → bloom decontamination (q83) → bigram-LM quality
  *   scoring (q103) → token-budget selection (q82) → BPE shard packing
  *   (q99)
  *
  * Every stage is an operator already verified solo; composing them in one
  * plan is what catches INTERFACE drift the per-query checks cannot —
  * column contracts between stages, join-key types, cache interplay, and
  * the statistics stages (BPE vocabulary, LM counts) being trained on the
  * post-dedup post-decontamination corpus rather than the raw table.
  *
  * Pipeline semantics:
  *  1. survivors = lowest-id doc per normalized-text md5 fingerprint.
  *  2. the held-out "test" hash-split of the FULL corpus defines the
  *     contamination set; its shingle grams fold into the Bloom filter
  *     once, and surviving "train" docs that hit it are dropped (the
  *     deterministic false positives included — oracle-replayed).
  *  3. the add-one-smoothed bigram LM is trained on the KEPT corpus and
  *     scores each kept doc: qs = ll_proxy div n_bigrams (pure int64).
  *  4. kept docs are taken best-first (qs DESC, doc_id) until the BPE
  *     token budget is spent — token counts from the BPE kernel under the
  *     vocabulary induced on the kept corpus, not whitespace counts.
  *  5. the selection packs into per-source shards by cumulative BPE
  *     tokens; output is the per-shard manifest (source, shard, n_docs,
  *     shard_tokens).
  *
  * Scale shape: each stage keeps its solo plan (fingerprint agg; scan-
  * speed bloom probe against broadcast bits; two n-gram aggs + hash
  * joins; banded two-level prefix sums for selection and packing). The
  * composition adds only doc_id equi-joins between stages — no new
  * windows, no new corpus×corpus surface.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  /** BPE-token budget for the selection stage — sized so the sf0.01
    * corpus keeps a meaningful strict subset (some docs selected, some
    * cut). */
  val CurationTokenBudget = 20000L

  /** Contamination gram width. Real decontamination passes use 8–13-word
    * windows (sentence-scale overlap), NOT the 3-gram shingles the
    * near-dup LSH uses: over the synthetic table's closed 31-word
    * vocabulary every 3-gram genuinely occurs in the held-out split, so a
    * 3-gram filter flags ~99% of the corpus as contaminated — true
    * overlap, not false positives — and the pipeline would train on
    * nothing. 8-grams measure verbatim passage reuse instead. */
  val CurShingleN = 8

  // the ONE shared tokenizer (see LexicalQueries.toks): the LM stage
  // here must stay token-identical to q103's
  private def toks(c: org.apache.spark.sql.Column) = LexicalQueries.toks(c)
  private val SqlToks = LexicalQueries.SqlToks

  val q109_curation_pipeline: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val docs = Tables.documents(s, d)
    // 1. exact-dedup survivors (q21's fingerprint clusters)
    val survivors = Dedup.exactClusters(docs, "doc_id", "text")
      .select($"survivor_id".as("doc_id"))
    // 2. bloom decontamination (q83): test split of the FULL corpus is
    // the held-out set; candidates = survivors in the train split
    val splits = Sampling.hashSplit(docs.select($"doc_id"), "doc_id",
      Seq("train" -> 0.8, "test" -> 0.2))
    // hashed feeds the bloom build (an action: the bits collect) AND the
    // candidate probe — persist one copy so the 8-gram kernel scans the
    // corpus text once, not twice
    val hashed = OperatorCaches.register(docs.select($"doc_id",
      columnOf(graft.plans.WordShingleHashes(
        expressionOf($"text"), CurShingleN, 7)).as("ghash")).persist())
    val candIds = OperatorCaches.register(survivors
      .join(splits.filter($"split" === "train"), "doc_id")
      .select($"doc_id").persist())
    // Two independent driver barriers overlap: the bloom-bits collect
    // (which materializes the 8-gram `hashed` cache) and the exact-dedup
    // fingerprint aggregation behind candIds — neither reads the other's
    // output, so their corpus scans share the wall-clock.
    val bits = graft.operators.Clustering.concurrentFrames(Seq(
      hashed.join(splits.filter($"split" === "test"), "doc_id"),
      candIds)) { (i, df) =>
      if (i == 0) Left(Dedup.bloomFilterBits(df,
        DedupQueries.BloomM, DedupQueries.BloomK))
      else Right(df.count())
    }.head.swap.getOrElse(sys.error("bloom bits task missing"))
    val keptIds = Dedup.bloomProbe(hashed.join(candIds, "doc_id"), bits,
        DedupQueries.BloomM, DedupQueries.BloomK)
      .filter(!$"flagged")
      .select($"doc_id")
    // kept feeds FOUR consumers (BPE wordFreq, the kernel scan, the LM
    // grams, the packing source join) — persist one copy, materialized
    // once here so both overlapped trainers below read the cache
    val kept = OperatorCaches.register(docs.join(keptIds, "doc_id").persist())
    kept.count()
    // 4. (declared before 3 so its materialization can overlap the BPE
    // trainer) bigram-LM quality on the kept corpus (q103's int64 proxy)
    val withToks = kept.select($"doc_id", toks($"text").as("t"))
    val grams = withToks.select($"doc_id",
        explode(zip_with(
          slice($"t", lit(1), greatest(size($"t") - 1, lit(0))),
          slice($"t", lit(2), greatest(size($"t") - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("g"))
      .withColumn("w1", split($"g", " ", 2).getItem(0))
    val unigrams = withToks.select($"doc_id", explode($"t").as("w"))
    val c12 = grams.groupBy($"g").agg(count(lit(1)).as("c12"))
    val c1 = unigrams.groupBy($"w").agg(count(lit(1)).as("c1"))
    val vocab = unigrams.agg(countDistinct($"w").as("vocab"))
    val quality = OperatorCaches.register(grams.join(c12, "g")
      .join(c1, $"w1" === $"w")
      .crossJoin(broadcast(vocab))
      .withColumn("term",
        expr(s"(c12 + 1) * ${LexicalQueries.LmScale} div (c1 + vocab)"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"term").as("ll_proxy"))
      .select($"doc_id", expr("ll_proxy div n_bigrams").as("qs"))
      .persist())
    // 3. BPE vocabulary induced on the kept corpus. The trainer's driver
    // barrier (word-freq collect + local merge induction) and the LM
    // quality aggregation are independent — both read only the cached
    // `kept` — so they run concurrently; the statistics stages' combined
    // wall-clock is max(trainer, LM aggs) instead of their sum.
    val merges = graft.operators.Clustering.concurrentFrames(
      Seq(kept, quality)) { (i, df) =>
      if (i == 0) Left(Bpe.trainAuto(
        Bpe.wordFreq(Bpe.docWords(df, "doc_id", "text")),
        BpeQueries.BpeMerges)._1)
      else Right(df.count())
    }.head.swap.getOrElse(sys.error("bpe trainer task missing"))
    val lhs = merges.map(_.lhs).toArray
    val rhs = merges.map(_.rhs).toArray
    val toked = kept
      .select($"source", $"doc_id",
        columnOf(graft.plans.BpeDocStats(expressionOf($"text"), lhs, rhs))
          .as("st"))
      .select($"source", $"doc_id", element_at($"st", 1).as("nw"),
        element_at($"st", 2).as("n_toks"))
      .filter($"nw" > 0).drop("nw")
    // 5. budget selection: best-first by (qs DESC, doc_id), BPE weights
    val sel = Sampling.budgetSelect(
      toked.join(quality, "doc_id").select($"doc_id", $"qs", $"n_toks"),
      "qs", "doc_id", "n_toks", CurationTokenBudget)
    // 6. per-source shard packing of the selection (q99's manifest)
    Packing.packShards(
        toked.join(sel.select($"doc_id"), "doc_id")
          .select($"source", $"doc_id", $"n_toks".as("w")),
        "source", "doc_id", "w",
        budget = BpeQueries.PackBudget, bucketSize = BpeQueries.PackBucket)
      .groupBy($"source", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"w").as("shard_tokens"))
      .orderBy($"source", $"shard")
  }

  lazy val q109_sql: String = {
    import graft.operators.Dedup.{sqlHash28, sqlWordShingles}
    val m = DedupQueries.BloomM
    val bk = DedupQueries.BloomK
    def posOf(h: String, j: String) =
      s"(($h % $m) + $j * (2 * ($h // $m) + 1)) % $m"
    s"""WITH fp AS (
       |  SELECT min(doc_id) AS doc_id FROM documents
       |  GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN ('0x'||substr(md5('split' || CAST(doc_id AS VARCHAR)),1,7))::BIGINT
       |           % 10000 < 8000 THEN 'train' ELSE 'test' END AS split
       |  FROM documents),
       |gh AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_distinct(list_transform(${sqlWordShingles("text", CurShingleN)},
       |      g -> ${sqlHash28("g")})) AS ghash
       |  FROM documents),
       |bloom AS MATERIALIZED (
       |  SELECT DISTINCT ${posOf("t.h", "j.j")} AS pos
       |  FROM (SELECT unnest(g.ghash) AS h FROM gh g JOIN sp USING (doc_id)
       |        WHERE sp.split = 'test') t,
       |       range($bk) j(j)),
       |cand AS (
       |  SELECT f.doc_id FROM fp f JOIN sp USING (doc_id)
       |  WHERE sp.split = 'train'),
       |probe AS (
       |  SELECT t.doc_id, t.h, j.j, ${posOf("t.h", "j.j")} AS pos
       |  FROM (SELECT g.doc_id, unnest(g.ghash) AS h
       |        FROM gh g JOIN cand USING (doc_id)) t,
       |       range($bk) j(j)),
       |hits AS (
       |  SELECT doc_id, h FROM probe JOIN bloom USING (pos)
       |  GROUP BY doc_id, h HAVING count(*) = $bk),
       |hc AS (SELECT doc_id, count(*) AS n FROM hits GROUP BY doc_id),
       |keptids AS (
       |  SELECT c.doc_id FROM cand c LEFT JOIN hc USING (doc_id)
       |  WHERE coalesce(hc.n, 0) = 0),
       |kept AS MATERIALIZED (
       |  SELECT d.* FROM documents d JOIN keptids USING (doc_id)),
       |${BpeQueries.trainerSqlFrom("kept")},
       |ws AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wt
       |  FROM t${BpeQueries.BpeMerges} GROUP BY word),
       |dtok AS (
       |  SELECT d.doc_id, CAST(sum(s.wt) AS BIGINT) AS n_toks
       |  FROM docwords d JOIN ws s USING (word) GROUP BY d.doc_id),
       |lt AS MATERIALIZED (SELECT doc_id, $SqlToks AS t FROM kept),
       |lgrams AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i + 1])) AS g
       |  FROM lt),
       |lgw AS (SELECT doc_id, g, string_split(g, ' ')[1] AS w1 FROM lgrams),
       |lunigrams AS MATERIALIZED (SELECT doc_id, unnest(t) AS w FROM lt),
       |lc12 AS (SELECT g, count(*) AS c12 FROM lgrams GROUP BY g),
       |lc1 AS (SELECT w, count(*) AS c1 FROM lunigrams GROUP BY w),
       |lvocab AS (SELECT count(DISTINCT w) AS vocab FROM lunigrams),
       |lterms AS (
       |  SELECT g.doc_id,
       |    CAST((c.c12 + 1) * ${LexicalQueries.LmScale} // (u.c1 + v.vocab)
       |      AS BIGINT) AS term
       |  FROM lgw g JOIN lc12 c USING (g) JOIN lc1 u ON g.w1 = u.w
       |  CROSS JOIN lvocab v),
       |quality AS (
       |  SELECT doc_id,
       |    CAST(CAST(sum(term) AS BIGINT) // count(*) AS BIGINT) AS qs
       |  FROM lterms GROUP BY doc_id),
       |bsel AS (
       |  SELECT dt.doc_id, dt.n_toks,
       |    CAST(sum(dt.n_toks) OVER (ORDER BY q.qs DESC, dt.doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM dtok dt JOIN quality q USING (doc_id)),
       |sel AS (
       |  SELECT doc_id, n_toks FROM bsel WHERE cum <= $CurationTokenBudget),
       |pt AS (
       |  SELECT k.source, s.doc_id, s.n_toks AS w
       |  FROM sel s JOIN kept k USING (doc_id)),
       |pc AS (
       |  SELECT source, doc_id, w,
       |    sum(w) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM pt)
       |SELECT source, CAST((cum - w) // ${BpeQueries.PackBudget} AS BIGINT) AS shard,
       |  count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS shard_tokens
       |FROM pc GROUP BY source, shard ORDER BY source, shard""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q109_curation_pipeline" -> q109_curation_pipeline)
  val oracleSql: Map[String, String] = Map(
    "q109_curation_pipeline" -> q109_sql)
}
