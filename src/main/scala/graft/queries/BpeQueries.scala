package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Bpe

/** BPE tokenizer queries over the `documents` table.
  *
  * q95: vocabulary induction — the merge list after [[BpeMerges]] rounds
  * of freq-weighted pair-merge training (step, lhs, rhs, cnt).
  * q96: corpus encoding under that vocabulary — per-document token
  * statistics (the real token counts budget selection / packing run on).
  *
  * The oracle replays the ENTIRE trainer relationally: each round is an
  * unrolled CTE block (lead-window pair counts → 1-row argmax → run-parity
  * merge application), mirroring [[Bpe.train]] operation for operation, so
  * the hash compare verifies induction order, tie-breaks, and the merge
  * semantics themselves — not just final counts.
  */
object BpeQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Merge rounds — enough to induce multi-char subwords over the test
    * vocabulary while keeping the oracle's unrolled chain readable. */
  val BpeMerges = 6

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  val q95_bpe_vocab: Q = (s, d) => {
    import s.implicits._
    val wf = Bpe.wordFreq(Bpe.docWords(docs(s, d), "doc_id", "text"))
    val (merges, _) = Bpe.trainAuto(wf, BpeMerges)
    merges.toDF().select($"step", $"lhs", $"rhs", $"cnt").orderBy($"step")
  }

  val q96_bpe_encode: Q = (s, d) => {
    import s.implicits._
    val dw = Bpe.docWords(docs(s, d), "doc_id", "text")
    val (_, toks) = Bpe.trainAuto(Bpe.wordFreq(dw), BpeMerges)
    val wstats = toks.groupBy("word")
      .agg(count(lit(1)).as("wt"), max(length($"tok")).as("wm"))
    dw.join(wstats, "word")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"), sum($"wt").as("n_tokens"),
        max($"wm").as("max_tok_len"))
      .orderBy($"doc_id")
  }

  /** q97: the same per-document token statistics as [[q96_bpe_encode]],
    * but encoded by the codegen'd [[graft.plans.BpeDocStats]] KERNEL
    * against the trained merge list — zero joins/shuffles/iterations over
    * the corpus (train once, then token-count every document in the scan
    * that reads it). Verified against the IDENTICAL oracle as q96, so the
    * kernel's sequential greedy merge is proven equivalent to the
    * trainer's relational run-parity application on every corpus word. */
  val q97_bpe_kernel_stats: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val (merges, _) =
      Bpe.trainAuto(Bpe.wordFreq(Bpe.docWords(docs(s, d), "doc_id", "text")),
        BpeMerges)
    val lhs = merges.map(_.lhs).toArray
    val rhs = merges.map(_.rhs).toArray
    docs(s, d)
      .select($"doc_id",
        columnOf(graft.plans.BpeDocStats(expressionOf($"text"), lhs, rhs))
          .as("st"))
      .select($"doc_id", element_at($"st", 1).as("n_words"),
        element_at($"st", 2).as("n_tokens"),
        element_at($"st", 3).as("max_tok_len"))
      // q96's join-based shape emits a row only for documents with >= 1
      // word; mirror that so both share one oracle
      .filter($"n_words" > 0)
      .orderBy($"doc_id")
  }

  /** q99: sequence packing driven by REAL tokenizer counts — q68's shard
    * packing re-run with the kernel's BPE token counts as weights instead
    * of whitespace counts, closing the loop the tokenizer exists for:
    * budget/packing decisions are exactly as real as their token counts.
    * Train once (bounded by the vocabulary), weigh every document in the
    * scan that reads it, pack per source. The oracle derives the same
    * per-document counts from the trainer chain and replays the
    * cumulative-sum shard assignment. */
  val PackBudget = 1000L
  val PackBucket = 64L

  val q99_bpe_pack_shards: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val (merges, _) =
      Bpe.trainAuto(Bpe.wordFreq(Bpe.docWords(docs(s, d), "doc_id", "text")),
        BpeMerges)
    val lhs = merges.map(_.lhs).toArray
    val rhs = merges.map(_.rhs).toArray
    val weighted = docs(s, d)
      .select($"source", $"doc_id",
        columnOf(graft.plans.BpeDocStats(expressionOf($"text"), lhs, rhs))
          .as("st"))
      .select($"source", $"doc_id", element_at($"st", 1).as("nw"),
        element_at($"st", 2).as("w"))
      .filter($"nw" > 0).drop("nw") // mirror the oracle's inner join
    graft.operators.Packing.packShards(weighted, "source", "doc_id", "w",
        budget = PackBudget, bucketSize = PackBucket)
      .groupBy($"source", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"w").as("shard_tokens"))
      .orderBy($"source", $"shard")
  }

  lazy val q99_sql: String =
    s"""WITH $trainerSql,
       |ws AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wt
       |  FROM t$BpeMerges GROUP BY word),
       |dtok AS (
       |  SELECT d.doc_id, CAST(sum(s.wt) AS BIGINT) AS w
       |  FROM docwords d JOIN ws s USING (word) GROUP BY d.doc_id),
       |t AS (
       |  SELECT doc.source, doc.doc_id, dt.w
       |  FROM documents doc JOIN dtok dt ON dt.doc_id = doc.doc_id),
       |c AS (
       |  SELECT source, doc_id, w,
       |    sum(w) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT source, CAST((cum - w) // $PackBudget AS BIGINT) AS shard,
       |  count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS shard_tokens
       |FROM c GROUP BY source, shard ORDER BY source, shard""".stripMargin

  /** Shared corpus/trainer CTE prologue: docwords → weighted distinct
    * words → char tokens t0, then [[BpeMerges]] unrolled rounds ending in
    * t{BpeMerges} (final tokens) and m1..m{BpeMerges} (the merges).
    *
    * Exhaustion parity: when a round has NO pairs left (every word a
    * single token), the engine stops early and keeps the last state —
    * so each m$i emits a sentinel ('', '') row when its pair table is
    * empty (a real token is never the empty string, so the sentinel
    * matches nothing and t$i = t${i-1} verbatim), and q95 filters the
    * sentinels out to mirror the engine's truncated merge list. */
  private def trainerSql: String = trainerSqlFrom("documents")

  /** The trainer chain over an arbitrary docs relation `docsRel(doc_id,
    * text, ...)` — q109's curation pipeline replays induction over its
    * decontaminated survivor corpus with the same CTEs. */
  private[queries] def trainerSqlFrom(docsRel: String): String = {
    def round(i: Int): String =
      s"""w$i AS MATERIALIZED (
         |  SELECT word, pos, tok,
         |    lead(tok) OVER (PARTITION BY word ORDER BY pos) AS ntok
         |  FROM t${i - 1}),
         |p$i AS (
         |  SELECT w.tok AS lhs, w.ntok AS rhs,
         |    CAST(sum(f.freq) AS BIGINT) AS cnt
         |  FROM w$i w JOIN wf f USING (word) WHERE w.ntok IS NOT NULL
         |  GROUP BY w.tok, w.ntok),
         |m$i AS (
         |  SELECT lhs, rhs, cnt FROM (
         |    SELECT lhs, rhs, cnt FROM p$i
         |    ORDER BY cnt DESC, lhs, rhs LIMIT 1)
         |  UNION ALL
         |  SELECT '' AS lhs, '' AS rhs, CAST(0 AS BIGINT) AS cnt
         |  WHERE NOT EXISTS (SELECT 1 FROM p$i)),
         |r$i AS (
         |  SELECT word, pos, tok, ntok, cand,
         |    CASE WHEN cand = 1 THEN pos - sum(cand)
         |      OVER (PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING)
         |    END AS grp
         |  FROM (
         |    SELECT w.word, w.pos, w.tok, w.ntok,
         |      CASE WHEN w.tok = m.lhs AND w.ntok = m.rhs THEN 1 ELSE 0 END AS cand
         |    FROM w$i w CROSS JOIN m$i m)),
         |k$i AS (
         |  SELECT word, pos, tok, ntok, acc,
         |    lag(acc) OVER (PARTITION BY word ORDER BY pos) AS pacc
         |  FROM (
         |    SELECT word, pos, tok, ntok,
         |      CASE WHEN cand = 1 AND row_number()
         |          OVER (PARTITION BY word, grp ORDER BY pos) % 2 = 1
         |        THEN 1 ELSE 0 END AS acc
         |    FROM r$i)),
         |t$i AS MATERIALIZED (
         |  SELECT word,
         |    row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
         |    CASE WHEN acc = 1 THEN tok || ntok ELSE tok END AS tok
         |  FROM k$i WHERE pacc IS NULL OR pacc = 0)""".stripMargin
    s"""docwords AS MATERIALIZED (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
       |    FROM $docsRel)
       |  WHERE word <> ''),
       |wf AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM docwords GROUP BY word),
       |t0 AS MATERIALIZED (
       |  SELECT word, i - 1 AS pos, substr(word, i, 1) AS tok FROM (
       |    SELECT word,
       |      CAST(unnest(generate_series(1, length(word))) AS INT) AS i
       |    FROM wf)),
       |${(1 to BpeMerges).map(round).mkString(",\n")}""".stripMargin
  }

  lazy val q95_sql: String = {
    val steps = (1 to BpeMerges)
      .map(i => s"SELECT $i AS step, lhs, rhs, cnt FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH $trainerSql
       |SELECT step, lhs, rhs, cnt FROM ($steps)
       |WHERE lhs <> '' ORDER BY step""".stripMargin
  }

  lazy val q96_sql: String =
    s"""WITH $trainerSql,
       |ws AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wt,
       |    max(length(tok)) AS wm
       |  FROM t$BpeMerges GROUP BY word)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(s.wt) AS BIGINT) AS n_tokens, max(s.wm) AS max_tok_len
       |FROM docwords d JOIN ws s USING (word)
       |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin

  // ── q112: BPE vocabulary persistence — induce the merge list once,
  // persist it as parquet (Bpe.saveMerges), load it back, and token-count
  // the corpus with the KERNEL driven by the LOADED vocabulary — the
  // tokenizer's face of the persistable-artifact convention (q106 PQ,
  // q110 LSH, q111 IVF). Parameters match q97 exactly and the merge list
  // roundtrips losslessly (strings + ints, step order restored), so the
  // served encode must reproduce q96/q97's output bit-for-bit: the
  // oracle IS q96's SQL. ─────────────────────────────────────────────────
  val q112_bpe_vocab_persist: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val (merges, _) =
      Bpe.trainAuto(Bpe.wordFreq(Bpe.docWords(docs(s, d), "doc_id", "text")),
        BpeMerges)
    val path = QueryTmp.dir("bpevocab", d)
    Bpe.saveMerges(merges, s, path)
    val loaded = Bpe.loadMerges(s, path)
    val lhs = loaded.map(_.lhs).toArray
    val rhs = loaded.map(_.rhs).toArray
    docs(s, d)
      .select($"doc_id",
        columnOf(graft.plans.BpeDocStats(expressionOf($"text"), lhs, rhs))
          .as("st"))
      .select($"doc_id", element_at($"st", 1).as("n_words"),
        element_at($"st", 2).as("n_tokens"),
        element_at($"st", 3).as("max_tok_len"))
      .filter($"n_words" > 0)
      .orderBy($"doc_id")
  }

  // ── q147: per-language tokenizer FERTILITY eval — the acceptance
  // gate a tokenizer ships through (how many subword tokens per word,
  // how many chars per token, per language tier): train the merge list
  // once on the whole corpus, token-count every document with the
  // codegen'd kernel (q97's zero-join economics), aggregate by the
  // documents table's lang column. Fixed point: ppm ratios are
  // tokens·2^20 div words — exact int64, engines agree bit-for-bit;
  // headroom to ~8.8e12 tokens PER LANGUAGE before the 2^63 multiply
  // overflows (divide before scaling past that, as q103 documents).
  // Scale shape: one corpus scan + a |languages|-row agg — the stats
  // partial-aggregate map-side; nothing corpus-sized shuffles. ──────────
  val q147_tokenizer_fertility: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val (merges, _) =
      Bpe.trainAuto(Bpe.wordFreq(Bpe.docWords(docs(s, d), "doc_id", "text")),
        BpeMerges)
    val lhs = merges.map(_.lhs).toArray
    val rhs = merges.map(_.rhs).toArray
    docs(s, d)
      .select($"lang", $"n_chars",
        columnOf(graft.plans.BpeDocStats(expressionOf($"text"), lhs, rhs))
          .as("st"))
      .select($"lang", $"n_chars", element_at($"st", 1).as("nw"),
        element_at($"st", 2).as("nt"))
      .filter($"nw" > 0)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"nw").as("words"),
        sum($"nt").as("tokens"), sum($"n_chars").as("chars"))
      .withColumn("fertility_ppm", expr("tokens * 1048576 div words"))
      .withColumn("chars_per_tok_ppm", expr("chars * 1048576 div tokens"))
      .orderBy($"lang")
  }

  lazy val q147_sql: String =
    s"""WITH $trainerSql,
       |ws AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wt
       |  FROM t$BpeMerges GROUP BY word),
       |dtok AS (
       |  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS nw,
       |    CAST(sum(s.wt) AS BIGINT) AS nt
       |  FROM docwords d JOIN ws s USING (word) GROUP BY d.doc_id)
       |SELECT doc.lang, count(*) AS n_docs,
       |  CAST(sum(dt.nw) AS BIGINT) AS words,
       |  CAST(sum(dt.nt) AS BIGINT) AS tokens,
       |  CAST(sum(doc.n_chars) AS BIGINT) AS chars,
       |  CAST(CAST(sum(dt.nt) AS BIGINT) * 1048576
       |    // CAST(sum(dt.nw) AS BIGINT) AS BIGINT) AS fertility_ppm,
       |  CAST(CAST(sum(doc.n_chars) AS BIGINT) * 1048576
       |    // CAST(sum(dt.nt) AS BIGINT) AS BIGINT) AS chars_per_tok_ppm
       |FROM documents doc JOIN dtok dt ON dt.doc_id = doc.doc_id
       |GROUP BY doc.lang ORDER BY lang""".stripMargin

  // ── q179: DISTRIBUTED trainer forced past the driver cap — the
  // local merge loop refuses a word set above `maxLocalWords`
  // (collectWordFreq's guard), so the 100 TB-shaped corpus here (the
  // real documents plus a 20k-unique-word synthetic tail, routed with
  // the cap pinned at 4096) runs `Bpe.train`'s windowed relational
  // rounds end-to-end. The oracle replays the SAME union corpus through
  // the same trainer chain, so the distributed path — not just the
  // local one q95 exercises at this SF — is hash-pinned. ───────────────
  val DistTrainCap = 4096L
  val DistTailWords = 20000

  val q179_bpe_distributed_train: Q = (s, d) => {
    import s.implicits._
    val tail = s.range(DistTailWords).select(
      (lit(1000000L) + $"id").as("doc_id"),
      concat(lit("zq"), $"id".cast("string")).as("text"))
    val corpus = docs(s, d).select($"doc_id", $"text").unionByName(tail)
    val wf = Bpe.wordFreq(Bpe.docWords(corpus, "doc_id", "text"))
    val (merges, _) = Bpe.trainAuto(wf, BpeMerges,
      maxLocalWords = DistTrainCap)
    merges.toDF().select($"step", $"lhs", $"rhs", $"cnt").orderBy($"step")
  }
  lazy val q179_sql: String = {
    val union = s"""(SELECT doc_id, text FROM documents
       |   UNION ALL
       |   SELECT 1000000 + r AS doc_id, 'zq' || CAST(r AS VARCHAR) AS text
       |   FROM range($DistTailWords) t(r))""".stripMargin
    val steps = (1 to BpeMerges)
      .map(i => s"SELECT $i AS step, lhs, rhs, cnt FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH ${trainerSqlFrom(union)}
       |SELECT step, lhs, rhs, cnt FROM ($steps)
       |WHERE lhs <> '' ORDER BY step""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q95_bpe_vocab" -> q95_bpe_vocab,
    "q96_bpe_encode" -> q96_bpe_encode,
    "q97_bpe_kernel_stats" -> q97_bpe_kernel_stats,
    "q99_bpe_pack_shards" -> q99_bpe_pack_shards,
    "q112_bpe_vocab_persist" -> q112_bpe_vocab_persist,
    "q147_tokenizer_fertility" -> q147_tokenizer_fertility,
    "q179_bpe_distributed_train" -> q179_bpe_distributed_train,
  )
  val oracleSql: Map[String, String] = Map(
    "q95_bpe_vocab" -> q95_sql,
    "q96_bpe_encode" -> q96_sql,
    // the kernel encode shares q96's oracle: same contract, so the hash
    // compare proves kernel == relational trainer state
    "q97_bpe_kernel_stats" -> q96_sql,
    "q99_bpe_pack_shards" -> q99_sql,
    // serve-from-persisted-vocabulary must reproduce q96/q97 exactly
    "q112_bpe_vocab_persist" -> q96_sql,
    "q147_tokenizer_fertility" -> q147_sql,
    "q179_bpe_distributed_train" -> q179_sql,
  )
}
