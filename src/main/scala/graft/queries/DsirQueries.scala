package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{OperatorCaches, UnigramLm}

/** DSIR-style data selection over the `documents` table — Data
  * Selection via Importance Resampling (Xie et al. 2023): score every
  * raw document by the log importance ratio of a TARGET distribution
  * over the RAW distribution under hashed bag-of-ngrams feature models,
  * then keep the top-scoring slice. The target here is the `lang='en'`
  * slice of the corpus (the "quality domain"); features are word
  * unigrams + adjacent bigrams hashed into [[Buckets]] buckets
  * ([[graft.plans.HashedNgramBuckets]]).
  *
  * Arithmetic is integer end to end so the DuckDB oracle reproduces it
  * bit-for-bit: smoothed bucket counts (+1), probabilities in the
  * unigram trainer's fixed point (log2 · 2^16 via
  * [[UnigramLm.ilog2fp]] — the oracle replays it with the same
  * unrolled HUGEINT squaring chain, [[UnigramQueries.lgChain]]), and
  * the per-doc score Σ_features (lg t̂[b] − lg T) − (lg r̂[b] − lg R).
  *
  * Scale shape (the 100 TB story): pass 1 explodes features but
  * aggregates straight down to ≤ [[Buckets]] groups (map-side combine
  * makes the shuffle ~buckets × cores rows); the weight table is a
  * driver-built ≤32 KB literal; pass 2 is one codegen'd scan
  * ([[graft.plans.BucketWeightSum]] — zero joins, zero shuffles) ending
  * in a TakeOrdered top-k. Never a corpus sort, never a corpus-wide
  * window.
  */
object DsirQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Hashed feature space size. 4096 keeps the weight literal at 32 KB
    * (the task-binary economics of the grouped-seed kernel) while
    * holding hash-collision mass low at the correctness SF. */
  val Buckets = 4096

  /** Selection size — the "resampled" slice. */
  val TopK = 100

  /** The target-domain slice the importance weights point toward. */
  val TargetLang = "en"

  val q142_dsir_select: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    // one kernel pass materializes the per-doc feature buckets; both the
    // counting aggregation and the scoring scan read the cached frame
    val withB = OperatorCaches.register(
      Tables.documents(s, d).select($"doc_id", $"lang",
          columnOf(graft.plans.HashedNgramBuckets(
            expressionOf($"text"), Buckets)).as("bs"))
        .persist())
    // ONE aggregation yields both models' counts: raw = every doc,
    // target = the lang slice (a second scan for the target would read
    // the corpus twice for no added information)
    val counts = withB.select($"lang", explode($"bs").as("bkt"))
      .groupBy($"bkt")
      .agg(count(lit(1)).as("raw_n"),
        sum(when($"lang" === TargetLang, 1L).otherwise(0L)).as("tgt_n"))
      .collect()
    val t = Array.fill(Buckets)(1L) // +1 smoothing: every bucket observed once
    val r = Array.fill(Buckets)(1L)
    counts.foreach { row =>
      val b = row.getLong(0).toInt
      r(b) += row.getLong(1)
      t(b) += row.getLong(2)
    }
    val lgT = UnigramLm.ilog2fp(t.sum)
    val lgR = UnigramLm.ilog2fp(r.sum)
    val w = Array.tabulate(Buckets) { b =>
      (UnigramLm.ilog2fp(t(b)) - lgT) - (UnigramLm.ilog2fp(r(b)) - lgR)
    }
    withB.select($"doc_id", $"lang", size($"bs").cast("long").as("n_feats"),
        columnOf(graft.plans.BucketWeightSum(
          expressionOf($"bs"), w)).as("score"))
      .orderBy($"score".desc, $"doc_id")
      .limit(TopK)
  }

  lazy val q142_sql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, word, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
       |  FROM (
       |    SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS i
       |    FROM (SELECT doc_id,
       |            string_split_regex(lower(text), '[^a-z0-9]+') AS ws
       |          FROM documents))
       |  WHERE word <> ''),
       |feats AS MATERIALIZED (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(word), 1, 7))::BIGINT % $Buckets AS bkt
       |  FROM toks
       |  UNION ALL
       |  SELECT a.doc_id,
       |    ('0x' || substr(md5(a.word || ' ' || c.word), 1, 7))::BIGINT % $Buckets AS bkt
       |  FROM toks a JOIN toks c ON c.doc_id = a.doc_id AND c.rn = a.rn + 1),
       |allb AS (SELECT CAST(range AS BIGINT) AS bkt FROM range($Buckets)),
       |tgtc AS (
       |  SELECT f.bkt, count(*) AS n FROM feats f
       |  JOIN documents d USING (doc_id) WHERE d.lang = '$TargetLang'
       |  GROUP BY 1),
       |rawc AS (SELECT bkt, count(*) AS n FROM feats GROUP BY 1),
       |tt AS (SELECT b.bkt, coalesce(t.n, 0) + 1 AS n
       |       FROM allb b LEFT JOIN tgtc t USING (bkt)),
       |rr AS (SELECT b.bkt, coalesce(r.n, 0) + 1 AS n
       |       FROM allb b LEFT JOIN rawc r USING (bkt)),
       |tin AS (SELECT CAST(bkt AS VARCHAR) AS piece, n FROM tt
       |        UNION ALL SELECT '', (SELECT CAST(sum(n) AS BIGINT) FROM tt)),
       |${UnigramQueries.lgChain("dt", "tin")},
       |rin AS (SELECT CAST(bkt AS VARCHAR) AS piece, n FROM rr
       |        UNION ALL SELECT '', (SELECT CAST(sum(n) AS BIGINT) FROM rr)),
       |${UnigramQueries.lgChain("dr", "rin")},
       |w AS MATERIALIZED (
       |  SELECT CAST(t.piece AS BIGINT) AS bkt,
       |    (t.lg - (SELECT lg FROM lgrdt WHERE piece = ''))
       |      - (r.lg - (SELECT lg FROM lgrdr WHERE piece = '')) AS w
       |  FROM lgrdt t JOIN lgrdr r USING (piece) WHERE t.piece <> ''),
       |scored AS (
       |  SELECT f.doc_id, count(*) AS n_feats, sum(w.w) AS score
       |  FROM feats f JOIN w USING (bkt) GROUP BY 1)
       |SELECT d.doc_id, d.lang,
       |  CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
       |  CAST(coalesce(s.score, 0) AS BIGINT) AS score
       |FROM documents d LEFT JOIN scored s USING (doc_id)
       |ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin

  val queries: Map[String, Q] = Map(
    "q142_dsir_select" -> q142_dsir_select,
  )
  val oracleSql: Map[String, String] = Map(
    "q142_dsir_select" -> q142_sql,
  )
}
