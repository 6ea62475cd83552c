package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.TextFunctions.tokens

/** Corpus-statistics lexical scoring over the `documents` table: BM25
  * retrieval (q100) and add-one-smoothed bigram-LM quality scoring (q103).
  *
  * Both operators are the token-stream statistics half of a training-data
  * pipeline — BM25 is the lexical leg of hybrid (lexical + ANN) retrieval
  * beside q25/q94, and the bigram LM is the classic cheap "perplexity-ish"
  * quality filter run before expensive model-based scoring.
  *
  * Exactness design (what makes these oracle-checkable):
  *   - Scores are NEVER summed as doubles. Each per-term / per-bigram
  *     contribution collapses to an int64 (BM25: one double expression per
  *     posting, identical operand order in both engines, then `floor ×2^20`
  *     to int64; LM: pure int64 arithmetic throughout), and only the int64s
  *     are summed — addition-order-free, so stable from local[32] to a
  *     1000-executor cluster.
  *   - Every double literal the SQL oracle sees is interpolated from the
  *     SAME Scala double the Spark plan embeds (toString round-trips
  *     exactly), so both engines evaluate bit-identical IEEE chains.
  *
  * Reference anchor: the reference has no retrieval/LM surface (it is a
  * Hadoop job framework, KM/framework/MapReduceJob.java); these are
  * LLM-pipeline charter upside, like q85-q90.
  */
object LexicalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Non-empty lowercase whitespace tokens — THE shared token universe
    * of the lexical, sketch, and curation queries (one definition:
    * q109's LM stage must stay token-identical to q103's, and a tweak
    * applied to one copy but not the others would silently break that
    * cross-query parity). */
  private[queries] def toks(c: org.apache.spark.sql.Column) =
    filter(tokens(c), t => length(t) > 0)
  /** DuckDB mirror of [[toks]] over a column named `text`. */
  private[queries] val SqlToks =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)"""

  // ── q100: BM25 top-k lexical retrieval ──────────────────────────────────
  // Query set = the token sets of documents doc_id < BmMaxQueryId (the same
  // "first rows are the queries" convention as the ANN queries, q25/q89);
  // corpus = every OTHER document. Score of doc n for query q:
  //
  //   Σ_{t ∈ q ∩ n}  idf(t) · tf_sat(t, n)
  //   idf   = (N - df + 0.5)/(df + 0.5) + 1            (Lucene's ≥1 form —
  //           rational, no log: libm vs JVM log differ in the last ULP)
  //   tf_sat = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  //
  // Scale shape: the tiny query-term set broadcasts into the posting-list
  // join on `term` (only matching terms' postings are ever scored — the
  // inverted-index access path, not a corpus scan); df is vocabulary-sized
  // (AQE broadcasts it when small, shuffles at corpus scale); corpus stats
  // (N, Σdl) ride along as a 1-row broadcast cross join; the final top-k
  // window partitions by q_id — never a global window.
  val BmK1 = 1.2
  val BmB = 0.75
  val BmMaxQueryId = 5L
  val BmTopK = 5
  /** Fixed-point scale for the int64 score sum. */
  val BmScale = 1048576L // 2^20
  // Pre-computed double constants, interpolated into BOTH engines so the
  // IEEE chains match bit-for-bit (1.2+1.0 != the parsed literal "2.2"'s
  // neighbour in general — never re-derive on one side only).
  private val K1p1 = BmK1 + 1.0
  private val OneMinusB = 1.0 - BmB

  /** The corpus token stream (doc_id, term) — the build input of the
    * BM25 index. */
  private def termStream(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", explode(toks($"text")).as("term"))
  }

  /** The query-term set under the "first rows are the queries"
    * convention: each doc_id < BmMaxQueryId queries with its DISTINCT
    * terms (the index's own postings for those docs). */
  private def queryTermsOf(idx: graft.operators.Bm25Index): DataFrame =
    idx.postings.filter(col("doc_id") < BmMaxQueryId)
      .select(col("doc_id").as("q_id"), col("term"))

  /** The full BM25 ranking pipeline down to per-query ranks (no top-k cut)
    * — shared by q100 (cut at BmTopK) and q104's fusion leg (cut at
    * RrfPoolN). Columns: (q_id, rank, doc_id, n_terms, score). The idf /
    * tf_sat double chains live in [[graft.operators.Retrieval.bm25Ranked]]
    * and are mirrored textually in the oracle SQL below — same operand
    * order, same literals. */
  private def bm25Ranked(s: SparkSession, d: String): DataFrame = {
    val idx = graft.operators.Retrieval.buildBm25Index(termStream(s, d))
    graft.operators.Retrieval.bm25Ranked(queryTermsOf(idx), idx,
      BmK1, BmB, BmScale)
  }

  val q100_bm25: Q = (s, d) => {
    import s.implicits._
    bm25Ranked(s, d)
      .where($"rank" <= BmTopK)
      .select($"q_id", $"rank", $"doc_id", $"n_terms", $"score")
      .orderBy($"q_id", $"rank")
  }
  /** The CTE chain mirroring [[bm25Ranked]]; terminal CTE is `ranked`
    * with (q_id, doc_id, n_terms, score, rank). */
  private lazy val bm25RankedCtes: String = bm25RankedCtesOver("")

  /** Same chain over a FILTERED corpus — q163's removal oracle passes
    * the remaining-docs predicate; queries draw from the same filtered
    * tf (a removed doc neither retrieves nor is retrievable). */
  private def bm25RankedCtesOver(corpusWhere: String): String =
    s"""terms AS (
       |  SELECT doc_id, unnest($SqlToks) AS term FROM documents $corpusWhere),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl),
       |qterms AS (
       |  SELECT doc_id AS q_id, term FROM tf WHERE doc_id < $BmMaxQueryId),
       |contribs AS (
       |  SELECT q.q_id, t.doc_id,
       |    CAST(floor(
       |      ((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
       |         / (CAST(f.df AS DOUBLE) + 0.5) + 1.0)
       |      * (CAST(t.tf AS DOUBLE) * $K1p1
       |         / (CAST(t.tf AS DOUBLE) + $BmK1 * ($OneMinusB
       |            + $BmB * (CAST(l.dl AS DOUBLE)
       |              / (CAST(s.total_len AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
       |      * $BmScale.0) AS BIGINT) AS contrib
       |  FROM qterms q
       |  JOIN tf t USING (term)
       |  JOIN df f USING (term)
       |  JOIN dl l ON l.doc_id = t.doc_id
       |  CROSS JOIN stats s
       |  WHERE t.doc_id <> q.q_id),
       |scored AS (
       |  SELECT q_id, doc_id, count(*) AS n_terms,
       |    CAST(sum(contrib) AS BIGINT) AS score
       |  FROM contribs GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score DESC, doc_id ASC) AS rank FROM scored)""".stripMargin
  lazy val q100_sql: String =
    s"""WITH $bm25RankedCtes
       |SELECT q_id, rank, doc_id, n_terms, score FROM ranked
       |WHERE rank <= $BmTopK ORDER BY q_id, rank""".stripMargin

  // ── q114: BM25 index persistence — build the inverted index ONCE
  // (Retrieval.buildBm25Index), persist its four artifacts as parquet,
  // load them back, and serve the q100 query batch from the LOADED index
  // with no corpus tokenization or aggregation recomputed — build-once/
  // serve-many lexical retrieval, completing the persistence family
  // (q106 PQ, q110 LSH, q111 IVF, q112 BPE). Every index column is
  // int64/string, so the roundtrip is bit-lossless; the oracle IS q100's
  // SQL, making save/load itself hash-verified. ───────────────────────────
  val q114_bm25_index_persist: Q = (s, d) => {
    import s.implicits._
    val path = QueryTmp.dir("bm25index", d)
    graft.operators.Retrieval.saveBm25Index(
      graft.operators.Retrieval.buildBm25Index(termStream(s, d)), path)
    val idx = graft.operators.Retrieval.loadBm25Index(s, path)
    graft.operators.Retrieval.bm25Ranked(queryTermsOf(idx), idx,
        BmK1, BmB, BmScale)
      .where($"rank" <= BmTopK)
      .select($"q_id", $"rank", $"doc_id", $"n_terms", $"score")
      .orderBy($"q_id", $"rank")
  }

  // ── q153: BM25 index UPDATE — the ingestion loop's third leg: build
  // the inverted index on the EXISTING corpus (doc_id % 7 <> 3), fold
  // the arriving slice (doc_id % 7 = 3) in with
  // Retrieval.updateBm25Index (postings/doclen union, docfreq
  // sum-merge, stats add — O(delta) tokenize, the archive is never
  // re-scanned), persist the updated artifact, and serve q100's query
  // batch from the RELOADED updated index. Every artifact is a monoid
  // over disjoint doc sets, so the updated index equals the full-corpus
  // build EXACTLY — the oracle IS q100's SQL, making update+swap+serve
  // hash-verified end to end. CLI: `index-update --type=bm25`. ──────────
  // ── q163: BM25 index REMOVE — right-to-be-forgotten on the lexical
  // tier: build the index on the FULL corpus, DROP the doc_id % 7 = 3
  // slice with Retrieval.removeFromBm25Index (anti-join the per-doc
  // surfaces, re-derive df/stats from the survivors — the archive is
  // never re-tokenized), persist through the staged swap, and serve
  // q100's query batch from the RELOADED index. Per-doc rows are
  // independent, so the removed index equals a fresh build on the
  // remaining corpus EXACTLY: the oracle is q100's chain over
  // `documents WHERE doc_id % 7 <> 3` — removed docs neither retrieve
  // nor are retrievable. CLI: `index-remove --type=bm25`. ───────────────
  val q163_bm25_index_remove: Q = (s, d) => {
    import s.implicits._
    val path = QueryTmp.dir("bm25rm0", d)
    graft.operators.Retrieval.saveBm25Index(
      graft.operators.Retrieval.buildBm25Index(termStream(s, d)), path)
    val removed = graft.operators.Retrieval.removeFromBm25Index(
      graft.operators.Retrieval.loadBm25Index(s, path),
      Tables.documents(s, d).filter($"doc_id" % 7 === 3).select($"doc_id"))
    val upPath = QueryTmp.dir("bm25rm1", d)
    graft.operators.Retrieval.saveBm25Index(removed, upPath)
    val idx = graft.operators.Retrieval.loadBm25Index(s, upPath)
    graft.operators.Retrieval.bm25Ranked(queryTermsOf(idx), idx,
        BmK1, BmB, BmScale)
      .where($"rank" <= BmTopK)
      .select($"q_id", $"rank", $"doc_id", $"n_terms", $"score")
      .orderBy($"q_id", $"rank")
  }
  lazy val q163_sql: String =
    s"""WITH ${bm25RankedCtesOver("WHERE doc_id % 7 <> 3")}
       |SELECT q_id, rank, doc_id, n_terms, score FROM ranked
       |WHERE rank <= $BmTopK ORDER BY q_id, rank""".stripMargin

  val q153_bm25_index_update: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    def termsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", explode(toks($"text")).as("term"))
    val path = QueryTmp.dir("bm25update", d)
    graft.operators.Retrieval.saveBm25Index(
      graft.operators.Retrieval.buildBm25Index(
        termsOf(docs.filter($"doc_id" % 7 =!= 3))), path)
    val updated = graft.operators.Retrieval.updateBm25Index(
      graft.operators.Retrieval.loadBm25Index(s, path),
      termsOf(docs.filter($"doc_id" % 7 === 3)))
    val upPath = QueryTmp.dir("bm25updated", d)
    graft.operators.Retrieval.saveBm25Index(updated, upPath)
    val idx = graft.operators.Retrieval.loadBm25Index(s, upPath)
    graft.operators.Retrieval.bm25Ranked(queryTermsOf(idx), idx,
        BmK1, BmB, BmScale)
      .where($"rank" <= BmTopK)
      .select($"q_id", $"rank", $"doc_id", $"n_terms", $"score")
      .orderBy($"q_id", $"rank")
  }

  // ── q186: SHARDED BM25 artifact — the rewrite-unit fix for the
  // lexical tier (the q175/q182 pattern): postings + docfreq shard by
  // term hash, doclen by doc id, stats is an O(1) rollup root — q153's
  // build/update/serve where the update rewrites ONLY the shards the
  // delta routes to (one all-or-nothing multi-root pointer commit).
  // Surface sets equal the unsharded artifact's, so the served ranking
  // equals the full-corpus build exactly: the oracle IS q100's SQL.
  // CLI: index-build/serve/update/remove --type=bm25-sharded. ───────────
  val q186_bm25_sharded_update: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    def termsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", explode(toks($"text")).as("term"))
    val path = QueryTmp.dir("bm25sharded", d)
    graft.operators.Retrieval.saveBm25Sharded(
      graft.operators.Retrieval.buildBm25Index(
        termsOf(docs.filter($"doc_id" % 7 =!= 3))), path, numShards = 4)
    graft.operators.Retrieval.updateBm25Sharded(s, path,
      termsOf(docs.filter($"doc_id" % 7 === 3)))
    val idx = graft.operators.Retrieval.loadBm25Sharded(s, path)
    graft.operators.Retrieval.bm25Ranked(queryTermsOf(idx), idx,
        BmK1, BmB, BmScale)
      .where($"rank" <= BmTopK)
      .select($"q_id", $"rank", $"doc_id", $"n_terms", $"score")
      .orderBy($"q_id", $"rank")
  }

  // ── q197: SEGMENTED BM25 lifecycle — the write-VOLUME fix on top of
  // q186's rewrite-unit fix. A crawl delta's term hashes spray across
  // the whole shard grid, so q186's merge-update still re-persisted
  // every touched shard's surface (measured SLOWER than the unsharded
  // merge at x25); append-mode updates instead land one DELTA-SIZED
  // immutable segment per routed shard — postings/doclen rows as-is,
  // docfreq as per-delta PARTIALS the load sum-merges — O(delta) write
  // volume. Two appends with overlapping vocabulary force the partial
  // merge, then Retrieval.compactBm25Sharded folds each root back to
  // one segment (purely physical). The served ranking equals the
  // full-corpus build after BOTH steps: the oracle IS q100's SQL.
  // CLI: index-update --mode=append + index-compact --type=bm25-sharded.
  val q197_bm25_segmented_compact: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    def termsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", explode(toks($"text")).as("term"))
    val path = QueryTmp.dir("bm25seg", d)
    graft.operators.Retrieval.saveBm25Sharded(
      graft.operators.Retrieval.buildBm25Index(
        termsOf(docs.filter($"doc_id" % 7 =!= 3 && $"doc_id" % 7 =!= 5))),
      path, numShards = 4)
    graft.operators.Retrieval.updateBm25Sharded(s, path,
      termsOf(docs.filter($"doc_id" % 7 === 3)), append = true)
    graft.operators.Retrieval.updateBm25Sharded(s, path,
      termsOf(docs.filter($"doc_id" % 7 === 5)), append = true)
    graft.operators.Retrieval.compactBm25Sharded(s, path)
    val idx = graft.operators.Retrieval.loadBm25Sharded(s, path)
    graft.operators.Retrieval.bm25Ranked(queryTermsOf(idx), idx,
        BmK1, BmB, BmScale)
      .where($"rank" <= BmTopK)
      .select($"q_id", $"rank", $"doc_id", $"n_terms", $"score")
      .orderBy($"q_id", $"rank")
  }

  // ── q104: hybrid retrieval via reciprocal-rank fusion ───────────────────
  // The standard lexical+dense combiner: each system contributes
  // 1/(K + rank) for its shortlist, missing docs contribute 0, fused
  // ranking = descending sum. Lexical leg = the BM25 ranking above
  // (top RrfPoolN); dense leg = exact-cosine ANN over the embeddings
  // table (Similarity.knnExact — swap in the IVF×PQ index at scale, same
  // (q_id, rank, n_id) shape). Exactness: each reciprocal is one double
  // division and the fusion is ONE fixed-order addition of two coalesced
  // terms — textually mirrored in the oracle, so doubles hash-compare.
  // Scale shape: both legs end top-N per query, so the fusion joins two
  // (queries × N)-row frames on (q_id, doc_id) — corpus-independent.
  val RrfK = 60
  val RrfPoolN = 10
  val RrfTopK = 5

  val q104_rrf_fusion: Q = (s, d) => {
    import s.implicits._
    val lex = bm25Ranked(s, d).where($"rank" <= RrfPoolN)
      .select($"q_id", $"doc_id", $"rank".as("lex_rank"))
    val dense = graft.operators.Similarity
      .knnExact(Tables.embeddings(s, d), "vec_id", "embedding",
        BmMaxQueryId, RrfPoolN)
      .select($"q_id", $"n_id".as("doc_id"),
        $"rank".cast(LongType).as("dense_rank"))
    graft.operators.Retrieval.rrfFuse(lex, dense, RrfK, RrfTopK)
      .orderBy($"q_id", $"rank")
  }
  lazy val q104_sql: String = {
    import graft.functions.VectorFunctions.{sqlScaled, sqlVnorm, sqlCosineFromNorms}
    val dim = VectorQueries.Dim
    s"""WITH $bm25RankedCtes,
       |lex AS (
       |  SELECT q_id, doc_id, rank AS lex_rank FROM ranked
       |  WHERE rank <= $RrfPoolN),
       |sv AS (
       |  SELECT vec_id, ${sqlScaled("embedding")} AS v,
       |    ${sqlVnorm(sqlScaled("embedding"), dim)} AS nrm
       |  FROM embeddings),
       |dscored AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
       |    ${sqlCosineFromNorms("q.v", "e.v", "q.nrm", "e.nrm", dim)} AS cos
       |  FROM sv q JOIN sv e
       |    ON q.vec_id < $BmMaxQueryId AND e.vec_id <> q.vec_id),
       |dense AS (
       |  SELECT q_id, doc_id, dense_rank FROM (
       |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, doc_id ASC) AS dense_rank FROM dscored)
       |  WHERE dense_rank <= $RrfPoolN),
       |fused AS (
       |  SELECT q_id, doc_id, lex_rank, dense_rank,
       |    COALESCE(1.0 / CAST(lex_rank + $RrfK AS DOUBLE), 0.0)
       |      + COALESCE(1.0 / CAST(dense_rank + $RrfK AS DOUBLE), 0.0) AS rrf
       |  FROM lex FULL OUTER JOIN dense USING (q_id, doc_id)),
       |frank AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY rrf DESC, doc_id ASC) AS rank FROM fused)
       |SELECT q_id, rank, doc_id, lex_rank, dense_rank, rrf FROM frank
       |WHERE rank <= $RrfTopK ORDER BY q_id, rank""".stripMargin
  }

  // ── q103: bigram-LM quality scoring ─────────────────────────────────────
  // Train add-one-smoothed bigram counts on the WHOLE corpus, then score
  // every document by its own bigrams' likelihood proxy. The per-bigram
  // term is pure int64 — (c12+1)·2^20 div (c1+V) — an integer-scaled
  // conditional probability P(w2|w1) ∈ [0, 2^20]; the per-doc score is the
  // int64 sum (arithmetic-mean proxy for the geometric-mean likelihood —
  // monotone in the same direction, and exactly order-free, unlike a sum
  // of float log-probs). All counts are nonnegative, so Spark's `div`
  // (trunc) and DuckDB's `//` (floor) agree.
  //
  // Scale shape: two corpus-stat aggs (bigram df is bounded by corpus token
  // count, unigram df by vocabulary) + two hash joins back onto the
  // exploded bigram stream + a per-doc agg — every stage partial-aggregates
  // map-side; no windows, no driver state. At 100 TB the c12/c1 tables are
  // the shuffle cost, exactly an n-gram count job's. int64 headroom caveat:
  // the (c12+1)·2^20 term overflows once a single bigram's corpus count
  // exceeds ~2^43 (≈8.8e12 — reachable for top stopword bigrams at full
  // 100 TB); past that, divide before scaling (or widen to DECIMAL) —
  // Spark would wrap silently where DuckDB errors, so the engines diverge
  // rather than stay oracle-exact.
  val LmScale = 1048576L // 2^20

  val q103_bigram_lm: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val withToks = docs.select($"doc_id", toks($"text").as("t"))
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
    grams.join(c12, "g")
      .join(c1, $"w1" === $"w")
      .crossJoin(broadcast(vocab))
      .withColumn("term",
        expr(s"(c12 + 1) * $LmScale div (c1 + vocab)"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"term").as("ll_proxy"))
      .withColumn("avg_ll",
        $"ll_proxy".cast(DoubleType) / $"n_bigrams".cast(DoubleType))
      .orderBy($"doc_id")
  }
  lazy val q103_sql: String =
    s"""WITH t AS (SELECT doc_id, $SqlToks AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i + 1])) AS g
       |  FROM t),
       |gw AS (SELECT doc_id, g, string_split(g, ' ')[1] AS w1 FROM grams),
       |unigrams AS (SELECT doc_id, unnest(t) AS w FROM t),
       |c12 AS (SELECT g, count(*) AS c12 FROM grams GROUP BY g),
       |c1 AS (SELECT w, count(*) AS c1 FROM unigrams GROUP BY w),
       |vocab AS (SELECT count(DISTINCT w) AS vocab FROM unigrams),
       |terms AS (
       |  SELECT gw.doc_id,
       |    CAST((c12.c12 + 1) * $LmScale // (c1.c1 + v.vocab) AS BIGINT) AS term
       |  FROM gw JOIN c12 USING (g) JOIN c1 ON gw.w1 = c1.w
       |  CROSS JOIN vocab v)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(sum(term) AS BIGINT) AS ll_proxy,
       |  CAST(CAST(sum(term) AS BIGINT) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS avg_ll
       |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ── q144: interpolated Kneser-Ney bigram LM ─────────────────────────────
  // The smoothing CCNet's KenLM scorer actually uses (Kneser & Ney 1995;
  // Chen & Goodman 1998 interpolated form), upgrading q103's add-one
  // baseline: the backoff mass of a context is proportional to how many
  // DISTINCT continuations it has (not its raw count), and the unigram
  // fallback is the CONTINUATION probability (in how many distinct
  // contexts does w appear) — the property that makes "Francisco" cheap
  // after "San" but expensive elsewhere.
  //
  //   P(w2|w1) = max(c12 − D, 0)/ctx(w1)
  //            + D·fwd(w1)/ctx(w1) · cont(w2)/B          with D = 3/4
  //   ctx(w1)  = Σ_w c12(w1,w)   (bigram tokens left-anchored at w1)
  //   fwd(w1)  = |{w : c12(w1,w) > 0}|   (distinct continuations)
  //   cont(w2) = |{w : c12(w,w2) > 0}|   (distinct left contexts)
  //   B        = |{(w,w') : c12 > 0}|    (distinct bigram types)
  //
  // Fixed point: D = 3/4 makes every term exact int64 —
  //   term = max(4·c12 − 3, 0)·S div (4·ctx1)
  //        + 3·fwd1·cont2·S div (4·ctx1·B)
  // (S = LmScale = 2^20; all operands nonnegative, so Spark `div` and
  // DuckDB `//` agree). int64 headroom: the backoff numerator
  // 3·fwd·cont·S overflows past ~1.7M distinct continuations per word
  // and the denominator 4·ctx·B past ctx·B ≈ 2.3e18 — reachable at the
  // full 100 TB like q103's documented (c12+1)·S term; past that,
  // divide before scaling (the engines would diverge loudly, not drift).
  //
  // Scale shape: identical to q103 — one gram explode, three
  // vocabulary-bounded stat aggs (per-bigram, per-left-word, per-right-
  // word; each partial-aggregates map-side), hash joins back onto the
  // gram stream, a per-doc agg. The stat tables are the SAME size class
  // as q103's c12/c1 (the fwd/cont distinct counts ride the c12 agg),
  // so KN costs one extra vocabulary-sized join over add-one — not a
  // new shuffle class. No windows, no driver state.
  val q144_kneser_ney: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val withToks = docs.select($"doc_id", toks($"text").as("t"))
    val grams = withToks.select($"doc_id",
        explode(zip_with(
          slice($"t", lit(1), greatest(size($"t") - 1, lit(0))),
          slice($"t", lit(2), greatest(size($"t") - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("g"))
      .withColumn("w1", split($"g", " ", 2).getItem(0))
      .withColumn("w2", split($"g", " ", 2).getItem(1))
    // one agg over bigram types feeds c12, ctx/fwd (left), cont (right), B
    val c12 = grams.groupBy($"g").agg(count(lit(1)).as("c12"),
      first($"w1").as("bw1"), first($"w2").as("bw2"))
    val left = c12.groupBy($"bw1").agg(sum($"c12").as("ctx1"),
      count(lit(1)).as("fwd1"))
    val right = c12.groupBy($"bw2").agg(count(lit(1)).as("cont2"))
    val types = c12.agg(count(lit(1)).as("btypes"))
    grams.join(c12.select($"g", $"c12"), "g")
      .join(left, $"w1" === $"bw1")
      .join(right, $"w2" === $"bw2")
      .crossJoin(broadcast(types))
      .withColumn("term",
        expr(s"greatest(4 * c12 - 3, 0) * $LmScale div (4 * ctx1)" +
          s" + 3 * fwd1 * cont2 * $LmScale div (4 * ctx1 * btypes)"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"term").as("kn_ll"))
      .withColumn("avg_kn",
        $"kn_ll".cast(DoubleType) / $"n_bigrams".cast(DoubleType))
      .orderBy($"doc_id")
  }
  lazy val q144_sql: String =
    s"""WITH t AS (SELECT doc_id, $SqlToks AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i + 1])) AS g
       |  FROM t),
       |gw AS (SELECT doc_id, g, string_split(g, ' ')[1] AS w1,
       |    string_split(g, ' ')[2] AS w2 FROM grams),
       |c12 AS (SELECT g, count(*) AS c12,
       |    string_split(g, ' ')[1] AS bw1, string_split(g, ' ')[2] AS bw2
       |  FROM grams GROUP BY g),
       |lft AS (SELECT bw1, CAST(sum(c12) AS BIGINT) AS ctx1,
       |    count(*) AS fwd1 FROM c12 GROUP BY bw1),
       |rgt AS (SELECT bw2, count(*) AS cont2 FROM c12 GROUP BY bw2),
       |btypes AS (SELECT count(*) AS btypes FROM c12),
       |terms AS (
       |  SELECT gw.doc_id,
       |    CAST(greatest(4 * c12.c12 - 3, 0) * $LmScale // (4 * l.ctx1)
       |      + 3 * l.fwd1 * r.cont2 * $LmScale // (4 * l.ctx1 * b.btypes)
       |      AS BIGINT) AS term
       |  FROM gw JOIN c12 USING (g) JOIN lft l ON gw.w1 = l.bw1
       |  JOIN rgt r ON gw.w2 = r.bw2 CROSS JOIN btypes b)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(sum(term) AS BIGINT) AS kn_ll,
       |  CAST(CAST(sum(term) AS BIGINT) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS avg_kn
       |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ── q107: exact sparse-cosine similarity join ───────────────────────────
  // All-pairs document similarity over tf vectors, via the inverted index
  // (Bayardo et al. 2007 economics): pairs form ONLY through shared terms
  // with df ≤ SparseDfCap — high-df terms (stopwords and boilerplate,
  // which connect everything to everything) never generate candidates, so
  // candidate count is Σ_term df² ≤ |vocab|·cap², linear in corpus for a
  // fixed cap. Distinct from the MinHash family (q22/q24): this is the
  // EXACT cosine over the capped term space, not an approximation —
  // integer dot products and norms, one double division per pair.
  val SparseDfCap = 64L
  val SparseCosThreshold = 0.6

  val q107_sparse_cosine_join: Q = (s, d) => {
    import s.implicits._
    val tf = Tables.documents(s, d)
      .select($"doc_id", explode(toks($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val rare = tf.join(df.filter($"df" <= SparseDfCap), "term")
    val norms = rare.groupBy($"doc_id").agg(sum($"tf" * $"tf").as("n2"))
    val prods = rare.as("a")
      .join(rare.as("b"),
        $"a.term" === $"b.term" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        ($"a.tf" * $"b.tf").as("p"))
      .groupBy($"doc_a", $"doc_b")
      .agg(sum($"p").as("num"), count(lit(1)).as("n_shared"))
    prods
      .join(norms.select($"doc_id".as("doc_a"), $"n2".as("n2a")), "doc_a")
      .join(norms.select($"doc_id".as("doc_b"), $"n2".as("n2b")), "doc_b")
      .withColumn("cos", $"num".cast(DoubleType) /
        (sqrt($"n2a".cast(DoubleType)) * sqrt($"n2b".cast(DoubleType))))
      .filter($"cos" >= SparseCosThreshold)
      .select($"doc_a", $"doc_b", $"n_shared", $"num", $"cos")
      .orderBy($"doc_a", $"doc_b")
  }
  lazy val q107_sql: String =
    s"""WITH terms AS (
       |  SELECT doc_id, unnest($SqlToks) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |rare AS (
       |  SELECT tf.doc_id, tf.term, tf.tf FROM tf
       |  JOIN df USING (term) WHERE df.df <= $SparseDfCap),
       |norms AS (
       |  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
       |  FROM rare GROUP BY 1),
       |prods AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(sum(a.tf * b.tf) AS BIGINT) AS num, count(*) AS n_shared
       |  FROM rare a JOIN rare b
       |    ON a.term = b.term AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_shared, num,
       |  CAST(num AS DOUBLE)
       |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
       |FROM prods
       |JOIN norms na ON na.doc_id = doc_a
       |JOIN norms nb ON nb.doc_id = doc_b
       |WHERE CAST(num AS DOUBLE)
       |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
       |  >= $SparseCosThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ── q108: exact FULL-SPACE sparse-cosine join (Bayardo prefix filter) ──
  // q107's df-cap is exact over a reduced space: terms with df > cap are
  // deleted from the vectors, so documents similar only through medium-df
  // terms above the cap are invisible. q108 removes the recall loss with
  // Bayardo's remaining-mass prefix filter (SparseSimilarity): the cosine
  // is over EVERY term; only the candidate index is pruned, by an
  // integer-exact suffix-mass bound that provably cannot drop a
  // qualifying pair. Acceptance is the int64 comparison
  // num²·tDen² ≥ tNum²·n2a·n2b — replayed identically by the oracle, so
  // the hash verifies candidate generation AND the exact-threshold
  // decisions, not a float approximation of them.
  val SparseTNum = 6L
  val SparseTDen = 10L // threshold 6/10 = q107's 0.6, as an exact rational
  /** Batch bound for the q108 contract query. The synthetic documents
    * table has a CLOSED 31-word vocabulary (every term df ≥ 25 at
    * sf0.01), which makes full-space similarity degenerate-DENSE: 58% of
    * all pairs genuinely exceed 0.6, so the output — not the algorithm —
    * is quadratic, and no exact join can be subquadratic in its own
    * result. Real corpora are open-vocabulary (hapax-heavy), where the
    * prefix index prunes; SparseSimilaritySpec pins that economy. The
    * contract query therefore scores one bounded batch (the full sf0.01
    * corpus — the correctness gate loses nothing), the way a production
    * near-dup pass windows its self-join. */
  val SparseMaxDocs = 500L

  val q108_sparse_prefix_join: Q = (s, d) => {
    import s.implicits._
    val terms = Tables.documents(s, d)
      .filter($"doc_id" < SparseMaxDocs) // parquet-pruned before the explode
      .select($"doc_id", explode(toks($"text")).as("term"))
    graft.operators.SparseSimilarity
      .cosineJoinExact(terms, SparseTNum, SparseTDen)
      .orderBy($"doc_a", $"doc_b")
  }
  lazy val q108_sql: String = {
    val tn2 = SparseTNum * SparseTNum
    val td2 = SparseTDen * SparseTDen
    s"""WITH terms AS (
       |  SELECT doc_id, unnest($SqlToks) AS term FROM documents
       |  WHERE doc_id < $SparseMaxDocs),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |rk AS (
       |  SELECT tf.doc_id, tf.term, tf.tf,
       |    sum(tf.tf * tf.tf) OVER (PARTITION BY tf.doc_id
       |      ORDER BY df.df DESC, tf.term ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(tf.tf * tf.tf) OVER (PARTITION BY tf.doc_id) AS n2
       |  FROM tf JOIN df USING (term)),
       |idx AS (
       |  SELECT doc_id, term, tf FROM rk
       |  WHERE cum * $td2 >= $tn2 * n2),
       |cand AS (
       |  SELECT DISTINCT least(p.doc_id, i.doc_id) AS doc_a,
       |    greatest(p.doc_id, i.doc_id) AS doc_b
       |  FROM tf p JOIN idx i ON p.term = i.term AND p.doc_id <> i.doc_id),
       |norms AS (
       |  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
       |  FROM tf GROUP BY 1),
       |dots AS (
       |  SELECT c.doc_a, c.doc_b, CAST(sum(a.tf * b.tf) AS BIGINT) AS num,
       |    count(*) AS n_shared
       |  FROM cand c
       |  JOIN tf a ON a.doc_id = c.doc_a
       |  JOIN tf b ON b.doc_id = c.doc_b AND b.term = a.term
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_shared, num,
       |  CAST(num AS DOUBLE)
       |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
       |FROM dots
       |JOIN norms na ON na.doc_id = doc_a
       |JOIN norms nb ON nb.doc_id = doc_b
       |WHERE num * num * $td2 >= $tn2 * na.n2 * nb.n2
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ── q127: vocabulary drift between corpus snapshots — the data-ops
  // distribution monitor beside q119's row diff: token-occurrence
  // probabilities of the old and new snapshots (q119/q122's derivations)
  // compared term by term in integer-scaled space, reporting the
  // DriftTopK most-drifted terms. pa = cnt·2^20 div total is pure int64
  // (trunc == floor on nonnegatives), absent terms count 0, and the
  // top-k cut orders by (drift DESC, term ASC) — fully deterministic, so
  // the oracle replays the entire ranking. Scale shape: two token-count
  // aggs (full map-side combine) + a vocabulary-sized full-outer join +
  // a top-k over the VOCAB frame (never corpus rows). ────────────────────
  val DriftScale = 1048576L // 2^20
  val DriftTopK = 15

  val q127_vocab_drift: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    def counts(snap: DataFrame) = snap
      .select(explode(toks($"text")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
    val oldC = counts(docs.filter($"doc_id" % 10 =!= 0))
    val newC = counts(docs.filter($"doc_id" % 13 =!= 0)
      .select(concat($"text",
        when($"doc_id" % 7 === 0, lit(" rev2")).otherwise(lit("")))
        .as("text")))
    val totals = oldC.agg(sum($"cnt").as("tot_a"))
      .crossJoin(newC.agg(sum($"cnt").as("tot_b")))
    oldC.select($"term", $"cnt".as("cnt_a"))
      .join(newC.select($"term", $"cnt".as("cnt_b")), Seq("term"),
        "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .crossJoin(broadcast(totals))
      .withColumn("pa", expr(s"cnt_a * $DriftScale div tot_a"))
      .withColumn("pb", expr(s"cnt_b * $DriftScale div tot_b"))
      .withColumn("drift", abs($"pa" - $"pb"))
      .orderBy($"drift".desc, $"term".asc)
      .limit(DriftTopK)
      .select($"term", $"cnt_a", $"cnt_b", $"pa", $"pb", $"drift")
      .orderBy($"drift".desc, $"term".asc)
  }
  lazy val q127_sql: String =
    s"""WITH oldd AS (
       |  SELECT unnest($SqlToks) AS term FROM documents
       |  WHERE doc_id % 10 <> 0),
       |newd AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text ||
       |      CASE WHEN doc_id % 7 = 0 THEN ' rev2' ELSE '' END), '\\s+'),
       |    x -> length(x) > 0)) AS term
       |  FROM documents WHERE doc_id % 13 <> 0),
       |ca AS (SELECT term, count(*) AS cnt_a FROM oldd GROUP BY 1),
       |cb AS (SELECT term, count(*) AS cnt_b FROM newd GROUP BY 1),
       |tot AS (
       |  SELECT (SELECT CAST(sum(cnt_a) AS BIGINT) FROM ca) AS tot_a,
       |    (SELECT CAST(sum(cnt_b) AS BIGINT) FROM cb) AS tot_b),
       |j AS (
       |  SELECT coalesce(ca.term, cb.term) AS term,
       |    coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b
       |  FROM ca FULL OUTER JOIN cb USING (term)),
       |scored AS (
       |  SELECT term, cnt_a, cnt_b,
       |    CAST(cnt_a * $DriftScale // tot_a AS BIGINT) AS pa,
       |    CAST(cnt_b * $DriftScale // tot_b AS BIGINT) AS pb
       |  FROM j CROSS JOIN tot)
       |SELECT term, cnt_a, cnt_b, pa, pb, abs(pa - pb) AS drift
       |FROM scored
       |ORDER BY drift DESC, term ASC
       |LIMIT $DriftTopK""".stripMargin

  // ── q143: Moore-Lewis cross-entropy difference selection ───────────────
  // The classic LM-contrastive domain filter (Moore & Lewis 2010): score
  // each document by (likelihood under an IN-DOMAIN bigram LM) −
  // (likelihood under the GENERAL corpus LM) and keep the top slice —
  // documents the in-domain model explains much better than the general
  // model are the domain-relevant ones. In-domain = the TargetLang slice
  // (q142's target), general = the whole corpus; both models are q103's
  // add-one-smoothed integer bigram LM, so the per-gram terms stay pure
  // int64 and the score is addition-order-free.
  //
  // Scale shape: ONE gram explode feeds both models — the in-domain
  // counts are conditional sums inside the same aggregation (no second
  // corpus pass, no left-join against a separate model table: a gram
  // unseen in-domain simply has ci12 = 0, which IS the smoothed-model
  // lookup miss), then the q103 join/agg economics and a TakeOrdered
  // top-k. Never a corpus sort.
  val CedTopK = 100
  val CedTargetLang = "en"

  val q143_cross_entropy_select: Q = (s, d) => {
    import s.implicits._
    val inDom = $"lang" === CedTargetLang
    val withToks = graft.operators.OperatorCaches.register(
      Tables.documents(s, d)
        .select($"doc_id", $"lang", toks($"text").as("t")).persist())
    val grams = withToks.select($"doc_id", $"lang",
        explode(zip_with(
          slice($"t", lit(1), greatest(size($"t") - 1, lit(0))),
          slice($"t", lit(2), greatest(size($"t") - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("g"))
      .withColumn("w1", split($"g", " ", 2).getItem(0))
    val gramsC = graft.operators.OperatorCaches.register(grams.persist())
    val unigrams = withToks.select($"lang", explode($"t").as("w"))
    val c12 = gramsC.groupBy($"g").agg(count(lit(1)).as("ca12"),
      sum(when(inDom, 1L).otherwise(0L)).as("ci12"))
    val c1 = unigrams.groupBy($"w").agg(count(lit(1)).as("ca1"),
      sum(when(inDom, 1L).otherwise(0L)).as("ci1"))
    val vocab = unigrams.agg(countDistinct($"w").as("va"),
      countDistinct(when(inDom, $"w")).as("vi"))
    gramsC.join(c12, "g")
      .join(c1, $"w1" === $"w")
      .crossJoin(broadcast(vocab))
      .withColumn("ti", expr(s"(ci12 + 1) * $LmScale div (ci1 + vi)"))
      .withColumn("ta", expr(s"(ca12 + 1) * $LmScale div (ca1 + va)"))
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_bigrams"), (sum($"ti") - sum($"ta")).as("score"))
      .orderBy($"score".desc, $"doc_id")
      .limit(CedTopK)
  }
  lazy val q143_sql: String =
    s"""WITH t AS (SELECT doc_id, lang, $SqlToks AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, lang, unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i + 1])) AS g
       |  FROM t),
       |gw AS (SELECT doc_id, lang, g, string_split(g, ' ')[1] AS w1 FROM grams),
       |unigrams AS (SELECT lang, unnest(t) AS w FROM t),
       |c12 AS (
       |  SELECT g, count(*) AS ca12,
       |    sum(CASE WHEN lang = '$CedTargetLang' THEN 1 ELSE 0 END) AS ci12
       |  FROM grams GROUP BY g),
       |c1 AS (
       |  SELECT w, count(*) AS ca1,
       |    sum(CASE WHEN lang = '$CedTargetLang' THEN 1 ELSE 0 END) AS ci1
       |  FROM unigrams GROUP BY w),
       |vocab AS (
       |  SELECT count(DISTINCT w) AS va,
       |    count(DISTINCT CASE WHEN lang = '$CedTargetLang' THEN w END) AS vi
       |  FROM unigrams),
       |terms AS (
       |  SELECT gw.doc_id, gw.lang,
       |    CAST((c12.ci12 + 1) * $LmScale // (c1.ci1 + v.vi) AS BIGINT) AS ti,
       |    CAST((c12.ca12 + 1) * $LmScale // (c1.ca1 + v.va) AS BIGINT) AS ta
       |  FROM gw JOIN c12 USING (g) JOIN c1 ON gw.w1 = c1.w
       |  CROSS JOIN vocab v)
       |SELECT doc_id, lang, count(*) AS n_bigrams,
       |  CAST(sum(ti) - sum(ta) AS BIGINT) AS score
       |FROM terms GROUP BY 1, 2
       |ORDER BY score DESC, doc_id LIMIT $CedTopK""".stripMargin

  // ── q180: hybrid retrieval SERVED FROM PERSISTED ARTIFACTS — q104's
  // reciprocal-rank fusion with both legs on their production serving
  // shapes: the lexical shortlist from the saved/loaded BM25 index
  // (q114's artifact) and the dense shortlist from the saved/loaded
  // ivfflat inverted lists (q156's artifact, probed serve — the "swap
  // in the index at scale" note on q104, now the measured thing). The
  // fusion operator itself is `Retrieval.rrfFuse` (shared with q104, so
  // the two cannot drift). The oracle replays the BM25 chain, the
  // coarse k-means fit, cell assignment, probing, the probed dense
  // ranking, and the fused reciprocal sum — both legs' arithmetic
  // bit-for-bit. Scale: each leg is its tier's pruned serve (posting
  // join / probed cells), and the fusion joins two (queries × pool)
  // frames — corpus-independent. ────────────────────────────────────────
  val q180_hybrid_artifact_serve: Q = (s, d) => {
    import s.implicits._
    val bmPath = QueryTmp.dir("hybm25", d)
    graft.operators.Retrieval.saveBm25Index(
      graft.operators.Retrieval.buildBm25Index(termStream(s, d)), bmPath)
    val bmIdx = graft.operators.Retrieval.loadBm25Index(s, bmPath)
    val lex = graft.operators.Retrieval.bm25Ranked(queryTermsOf(bmIdx),
        bmIdx, BmK1, BmB, BmScale)
      .where($"rank" <= RrfPoolN)
      .select($"q_id", $"doc_id", $"rank".as("lex_rank"))
    val ivPath = QueryTmp.dir("hyivf", d)
    graft.operators.Clustering.saveIvfFlatIndex(
      graft.operators.Clustering.buildIvfFlatIndex(
        Tables.embeddings(s, d), "vec_id", "embedding",
        1 << VectorQueries.ivfBits(s, d)), ivPath)
    val dense = graft.operators.Clustering.serveIvfFlat(
        graft.operators.Clustering.loadIvfFlatIndex(s, ivPath),
        Tables.embeddings(s, d), "vec_id", "embedding",
        BmMaxQueryId, VectorQueries.IvfNprobe, RrfPoolN)
      .select($"q_id", $"n_id".as("doc_id"),
        $"rank".cast(LongType).as("dense_rank"))
    graft.operators.Retrieval.rrfFuse(lex, dense, RrfK, RrfTopK)
      .orderBy($"q_id", $"rank")
  }
  lazy val q180_sql: String = {
    import graft.functions.VectorFunctions.{sqlScaled, sqlVnorm, sqlCosineFromNorms}
    import graft.operators.Similarity
    val dim = VectorQueries.Dim
    def cos(a: String, b: String, na: String, nb: String) =
      sqlCosineFromNorms(a, b, na, nb, dim)
    s"""WITH ${VectorQueries.sqlIvfParams}, $bm25RankedCtes,
       |sv AS (
       |  SELECT CAST(vec_id AS BIGINT) AS vid, ${sqlScaled("embedding")} AS v,
       |    ${sqlVnorm(sqlScaled("embedding"), dim)} AS nrm
       |  FROM embeddings
       |), ${VectorQueries.kmeansChainSql("iv", 0, dim,
          "(SELECT 1 << bits FROM ivfp)", Similarity.IvfCoarseIters,
          Similarity.IvfCoarseSalt)},
       |${VectorQueries.ivfCentSql(s"ivc${Similarity.IvfCoarseIters}")},
       |assigned AS (
       |  SELECT n_id, nv, nn, c_id FROM (
       |    SELECT s.vid AS n_id, s.v AS nv, s.nrm AS nn, c.c_id,
       |      row_number() OVER (PARTITION BY s.vid
       |        ORDER BY ${cos("s.v", "c.cv", "s.nrm", "c.cn")} DESC, c.c_id ASC) AS rn
       |    FROM sv s CROSS JOIN cent c)
       |  WHERE rn = 1
       |), probes AS (
       |  SELECT q_id, qv, qn, c_id FROM (
       |    SELECT q.vid AS q_id, q.v AS qv, q.nrm AS qn, c.c_id,
       |      row_number() OVER (PARTITION BY q.vid
       |        ORDER BY ${cos("q.v", "c.cv", "q.nrm", "c.cn")} DESC, c.c_id ASC) AS rn
       |    FROM sv q CROSS JOIN cent c WHERE q.vid < $BmMaxQueryId)
       |  WHERE rn <= ${VectorQueries.IvfNprobe}
       |), dscored AS (
       |  SELECT p.q_id, a.n_id AS doc_id,
       |    ${cos("p.qv", "a.nv", "p.qn", "a.nn")} AS cos
       |  FROM probes p JOIN assigned a ON a.c_id = p.c_id AND a.n_id <> p.q_id
       |), dense AS (
       |  SELECT q_id, doc_id, dense_rank FROM (
       |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, doc_id ASC) AS dense_rank FROM dscored)
       |  WHERE dense_rank <= $RrfPoolN),
       |lex AS (
       |  SELECT q_id, doc_id, rank AS lex_rank FROM ranked
       |  WHERE rank <= $RrfPoolN),
       |fused AS (
       |  SELECT q_id, doc_id, lex_rank, dense_rank,
       |    COALESCE(1.0 / CAST(lex_rank + $RrfK AS DOUBLE), 0.0)
       |      + COALESCE(1.0 / CAST(dense_rank + $RrfK AS DOUBLE), 0.0) AS rrf
       |  FROM lex FULL OUTER JOIN dense USING (q_id, doc_id)),
       |frank AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY rrf DESC, doc_id ASC) AS rank FROM fused)
       |SELECT q_id, rank, doc_id, lex_rank, dense_rank, rrf FROM frank
       |WHERE rank <= $RrfTopK ORDER BY q_id, rank""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q100_bm25" -> q100_bm25,
    "q103_bigram_lm" -> q103_bigram_lm,
    "q144_kneser_ney" -> q144_kneser_ney,
    "q143_cross_entropy_select" -> q143_cross_entropy_select,
    "q104_rrf_fusion" -> q104_rrf_fusion,
    "q107_sparse_cosine_join" -> q107_sparse_cosine_join,
    "q108_sparse_prefix_join" -> q108_sparse_prefix_join,
    "q114_bm25_index_persist" -> q114_bm25_index_persist,
    "q153_bm25_index_update" -> q153_bm25_index_update,
    "q163_bm25_index_remove" -> q163_bm25_index_remove,
    "q127_vocab_drift" -> q127_vocab_drift,
    "q180_hybrid_artifact_serve" -> q180_hybrid_artifact_serve,
    "q186_bm25_sharded_update" -> q186_bm25_sharded_update,
    "q197_bm25_segmented_compact" -> q197_bm25_segmented_compact)
  val oracleSql: Map[String, String] = Map(
    "q100_bm25" -> q100_sql,
    "q103_bigram_lm" -> q103_sql,
    "q144_kneser_ney" -> q144_sql,
    "q143_cross_entropy_select" -> q143_sql,
    "q104_rrf_fusion" -> q104_sql,
    "q107_sparse_cosine_join" -> q107_sql,
    "q108_sparse_prefix_join" -> q108_sql,
    "q114_bm25_index_persist" -> q100_sql,
    "q153_bm25_index_update" -> q100_sql,
    "q163_bm25_index_remove" -> q163_sql,
    "q127_vocab_drift" -> q127_sql,
    "q180_hybrid_artifact_serve" -> q180_sql,
    // sharded update+serve == the full-corpus build's ranking (q153's
    // exactness with per-shard rewrite units)
    "q186_bm25_sharded_update" -> q100_sql,
    "q197_bm25_segmented_compact" -> q100_sql)
}
