package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bpe, UnigramLm}

/** Unigram-LM tokenizer queries over the `documents` table — the
  * SentencePiece-style counterpart to the BPE family (q95–q99).
  *
  * q129: vocabulary induction — the trained piece table (piece, cnt,
  * cost) after [[UnigramLm.EmIters]] hard-EM rounds.
  * q130: corpus encoding by the codegen'd Viterbi KERNEL under that
  * vocabulary — per-document (n_words, n_tokens, total_cost).
  * q131: shard packing weighted by the unigram token counts (q99's
  * manifest shape).
  * q132: persistence — save the vocabulary, load it back, serve the
  * encode from the LOADED artifact (must reproduce q130 exactly).
  *
  * The oracle replays the ENTIRE trainer relationally: substring seeding,
  * the fixed-point integer log2 ([[UnigramLm.ilog2fp]]) as an unrolled
  * HUGEINT squaring chain, and each EM round's Viterbi as a recursive-CTE
  * forward DP + backtrack — mirroring the engine operation for operation,
  * so the hash compare verifies segmentation tie-breaks, the EM counts,
  * and the cost arithmetic itself, not just final shapes.
  */
object UnigramQueries {
  type Q = (SparkSession, String) => DataFrame

  import UnigramLm.{EmIters, LogFracBits, MaxPieceLen, SeedTop}

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  private def wordFreq(s: SparkSession, d: String): DataFrame =
    Bpe.wordFreq(Bpe.docWords(docs(s, d), "doc_id", "text"))

  // ── engine queries ──────────────────────────────────────────────────────

  val q129_unigram_vocab: Q = (s, d) => {
    import s.implicits._
    val vocab = UnigramLm.trainLocal(wordFreq(s, d))
    vocab.pieces.map(p => (p.piece, p.cnt, p.cost))
      .toDF("piece", "cnt", "cost").orderBy($"piece")
  }

  private def kernelStats(s: SparkSession, d: String,
                          vocab: UnigramLm.Vocab): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    docs(s, d)
      .select($"source", $"doc_id",
        columnOf(graft.plans.UnigramDocStats(expressionOf($"text"),
          vocab.pieceArr, vocab.costArr, vocab.unkCost)).as("st"))
      .select($"source", $"doc_id", element_at($"st", 1).as("n_words"),
        element_at($"st", 2).as("n_tokens"),
        element_at($"st", 3).as("total_cost"))
      // the oracle joins docwords (>=1 word) — mirror that
      .filter($"n_words" > 0)
  }

  val q130_unigram_encode: Q = (s, d) => {
    import s.implicits._
    kernelStats(s, d, UnigramLm.trainLocal(wordFreq(s, d)))
      .drop("source").orderBy($"doc_id")
  }

  val q131_unigram_pack: Q = (s, d) => {
    import s.implicits._
    val weighted = kernelStats(s, d, UnigramLm.trainLocal(wordFreq(s, d)))
      .select($"source", $"doc_id", $"n_tokens".as("w"))
    graft.operators.Packing.packShards(weighted, "source", "doc_id", "w",
        budget = BpeQueries.PackBudget, bucketSize = BpeQueries.PackBucket)
      .groupBy($"source", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"w").as("shard_tokens"))
      .orderBy($"source", $"shard")
  }

  val q132_unigram_persist: Q = (s, d) => {
    import s.implicits._
    val trained = UnigramLm.trainLocal(wordFreq(s, d))
    val path = QueryTmp.dir("ugvocab", d)
    UnigramLm.saveVocab(trained, s, path)
    val loaded = UnigramLm.loadVocab(s, path)
    kernelStats(s, d, loaded).drop("source").orderBy($"doc_id")
  }

  // ── oracle SQL generators ───────────────────────────────────────────────

  /** 2^125 / 2^63 / 2^62 as decimal literals (DuckDB parses the first
    * two as HUGEINT; arithmetic stays int128-exact). */
  private val P125 = "42535295865117307932921825928971026432"
  private val P63 = "9223372036854775808"
  private val P62 = "4611686018427387904"

  /** Unrolled [[UnigramLm.ilog2fp]] over relation `rel(piece, n)`:
    * emits CTEs `lg{tag}0..lg{tag}F` and `lgr{tag}(piece, lg)`. One
    * output bit per squaring step — HUGEINT square, compare against
    * 2^125, truncating renormalize — exactly the engine's integer
    * algorithm. */
  private def lgChain(tag: String, rel: String): String = {
    val steps = (1 to LogFracBits).map { i =>
      s"""lg$tag$i AS (
         |  SELECT piece, e,
         |    CASE WHEN (m::HUGEINT * m) >= $P125
         |      THEN ((m::HUGEINT * m) // $P63)::BIGINT
         |      ELSE ((m::HUGEINT * m) // $P62)::BIGINT END AS m,
         |    frac * 2 + CASE WHEN (m::HUGEINT * m) >= $P125 THEN 1 ELSE 0 END AS frac
         |  FROM lg$tag${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""lg${tag}0 AS (
       |  SELECT piece, length(bin(n)) - 1 AS e,
       |    (n << (62 - (length(bin(n)) - 1))) AS m, 0::BIGINT AS frac
       |  FROM $rel),
       |$steps,
       |lgr$tag AS MATERIALIZED (
       |  SELECT piece, e * ${1L << LogFracBits} + frac AS lg FROM lg$tag$LogFracBits)""".stripMargin
  }

  /** Costs from a counts relation `rel(piece, n)` (all n >= 1): CTEs for
    * the union-with-total input, the log chain, and `vc{k}(piece, cost)`
    * with cost = lg(total) − lg(n). */
  private def costBlock(k: Int, rel: String): String =
    s"""vcin$k AS (
       |  SELECT piece, n FROM $rel
       |  UNION ALL SELECT '', (SELECT CAST(sum(n) AS BIGINT) FROM $rel)),
       |${lgChain(s"c$k", s"vcin$k")},
       |vc$k AS MATERIALIZED (
       |  SELECT piece, (SELECT lg FROM lgrc$k WHERE piece = '') - lg AS cost
       |  FROM lgrc$k WHERE piece <> '')""".stripMargin

  /** Candidate packed key: `(cost << 24) | (np << 4) | (15 − L)` — one
    * BIGINT whose natural order IS the kernel's tie-break (cost ASC, np
    * ASC, L DESC; smaller tag = longer piece), so `least()` over the ≤
    * [[MaxPieceLen]] candidates replaces the per-row argmin. Needed
    * because DuckDB 1.0 silently yields nothing for a LATERAL subquery
    * over a derived CTE inside a recursive term (plain joins work);
    * bounds: cost < 2^39, np < 2^20 — orders of magnitude above any
    * corpus word. */
  private def packedKey(cost: String, np: String, l: Int): String =
    s"(($cost) << 24) | (($np) << 4) | ${15 - l}"

  /** Viterbi forward DP under cost table `vc{k}`: recursive CTE carrying
    * the last [[MaxPieceLen]] best states as a rolling tuple; per-step
    * argmin is `least()` over the packed candidate keys from
    * [[MaxPieceLen]] LEFT JOINs against the cost table. Emits `dpf{k}`
    * and the best table `bt{k}(word, j, cost, np)`. */
  private def dpForward(k: Int): String = {
    val joins = (1 to MaxPieceLen).map { l =>
      val guard = if (l == 1) "" else s"d.j >= ${l - 1} AND "
      s"""    LEFT JOIN vc$k v$l ON ${guard}v$l.piece = substr(d.word, d.j + ${2 - l}, $l)"""
    }.mkString("\n")
    val keys = (1 to MaxPieceLen).map { l =>
      s"""        CASE WHEN v$l.piece IS NOT NULL THEN ${packedKey(s"d.c${l - 1} + v$l.cost", s"d.n${l - 1} + 1", l)} END"""
    }.mkString(",\n")
    val nullCols = (1 until MaxPieceLen)
      .map(i => s"NULL::BIGINT AS c$i, NULL::BIGINT AS n$i").mkString(", ")
    val shiftIn = (0 until MaxPieceLen - 1)
      .map(i => s"d.c$i AS p$i, d.n$i AS q$i").mkString(", ")
    val shiftOut = (0 until MaxPieceLen - 1)
      .map(i => s"p$i, q$i").mkString(", ")
    s"""dpf$k AS (
       |  SELECT word, 0 AS j, 0::BIGINT AS c0, 0::BIGINT AS n0, $nullCols
       |  FROM wf
       |  UNION ALL
       |  SELECT word, j, key >> 24, (key >> 4) & 1048575, $shiftOut
       |  FROM (
       |    SELECT d.word AS word, d.j + 1 AS j,
       |      least(
       |$keys
       |      ) AS key,
       |      $shiftIn
       |    FROM dpf$k d
       |$joins
       |    WHERE d.j < length(d.word)
       |  ) WHERE key IS NOT NULL),
       |bt$k AS MATERIALIZED (SELECT word, j, c0 AS cost, n0 AS np FROM dpf$k)""".stripMargin
  }

  /** Backtrack under `bt{k}`/`vc{k}`: re-ranks the same packed candidate
    * keys at each position (prefix best from `bt{k}`, piece cost from
    * `vc{k}`), so `least()` follows exactly the path the forward pass
    * chose; emits one piece row per step. Produces `dpb{k}` and the
    * freq-weighted piece counts `cnt{k}(piece, cnt)`. */
  private def dpBacktrack(k: Int): String = {
    val joins = (1 to MaxPieceLen).map { l =>
      s"""    LEFT JOIN bt$k t$l ON t$l.word = b.word AND t$l.j = b.j - $l
         |    LEFT JOIN vc$k v$l ON v$l.piece = substr(b.word, b.j + ${1 - l}, $l)""".stripMargin
    }.mkString("\n")
    val keys = (1 to MaxPieceLen).map { l =>
      s"""        CASE WHEN v$l.piece IS NOT NULL AND t$l.j IS NOT NULL THEN ${packedKey(s"t$l.cost + v$l.cost", s"t$l.np + 1", l)} END"""
    }.mkString(",\n")
    val subs = (1 to MaxPieceLen)
      .map(l => s"substr(b.word, b.j + ${1 - l}, $l) AS s$l").mkString(", ")
    val pieceCase = (1 until MaxPieceLen)
      .map(l => s"WHEN $l THEN s$l").mkString(" ")
    s"""dpb$k AS (
       |  SELECT word, length(word) AS j, NULL::VARCHAR AS piece FROM wf
       |  UNION ALL
       |  SELECT word, j - (15 - (key & 15)),
       |    CASE (15 - (key & 15)) $pieceCase ELSE s$MaxPieceLen END
       |  FROM (
       |    SELECT b.word AS word, b.j AS j, $subs,
       |      least(
       |$keys
       |      ) AS key
       |    FROM dpb$k b
       |$joins
       |    WHERE b.j > 0
       |  ) WHERE key IS NOT NULL),
       |cnt$k AS MATERIALIZED (
       |  SELECT p.piece, CAST(sum(f.freq) AS BIGINT) AS cnt
       |  FROM dpb$k p JOIN wf f USING (word) WHERE p.piece IS NOT NULL
       |  GROUP BY 1)""".stripMargin
  }

  /** Post-E-step kept vocabulary with add-one smoothing: every seed char
    * (coverage) + used multi-char pieces. */
  private def keptBlock(k: Int): String =
    s"""vk$k AS MATERIALIZED (
       |  SELECT ch.piece, coalesce(c.cnt, 0) + 1 AS n
       |  FROM chars ch LEFT JOIN cnt$k c USING (piece)
       |  UNION ALL
       |  SELECT piece, cnt + 1 FROM cnt$k WHERE length(piece) > 1)""".stripMargin

  /** The full trainer chain: docwords/wf → substring seed → vc1 → EmIters
    * × (forward DP + backtrack + kept + costs) → vc{EmIters+1} (serving
    * costs) and a final forward DP dpf{EmIters+1} / per-word `fin`. */
  private def trainerSql: String = {
    val emRounds = (1 to EmIters).map { k =>
      s"""${dpForward(k)},
         |${dpBacktrack(k)},
         |${keptBlock(k)},
         |${costBlock(k + 1, s"vk$k")}""".stripMargin
    }.mkString(",\n")
    s"""docwords AS MATERIALIZED (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
       |    FROM documents)
       |  WHERE word <> ''),
       |wf AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM docwords GROUP BY word),
       |subs AS MATERIALIZED (
       |  SELECT substr(word, i, L) AS piece, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT word, freq,
       |          CAST(unnest(generate_series(1, length(word))) AS INT) AS i
       |        FROM wf),
       |       (SELECT CAST(unnest(generate_series(1, $MaxPieceLen)) AS INT) AS L)
       |  WHERE i + L - 1 <= length(word)
       |  GROUP BY 1),
       |chars AS (SELECT piece FROM subs WHERE length(piece) = 1),
       |seedsel AS MATERIALIZED (
       |  SELECT piece, cnt AS n FROM subs WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM subs WHERE length(piece) > 1
       |    ORDER BY cnt DESC, piece LIMIT $SeedTop)),
       |${costBlock(1, "seedsel")},
       |$emRounds,
       |${dpForward(EmIters + 1)},
       |fin AS MATERIALIZED (
       |  SELECT word, np, cost FROM bt${EmIters + 1} b
       |  JOIN (SELECT word AS w2, length(word) AS l2 FROM wf) x
       |    ON b.word = x.w2 AND b.j = x.l2)""".stripMargin
  }

  lazy val q129_sql: String =
    s"""WITH RECURSIVE $trainerSql
       |SELECT r.piece, r.cnt, v.cost FROM (
       |  SELECT ch.piece, coalesce(c.cnt, 0) AS cnt
       |  FROM chars ch LEFT JOIN cnt$EmIters c USING (piece)
       |  UNION ALL
       |  SELECT piece, cnt FROM cnt$EmIters WHERE length(piece) > 1) r
       |JOIN vc${EmIters + 1} v USING (piece)
       |ORDER BY piece""".stripMargin

  lazy val q130_sql: String =
    s"""WITH RECURSIVE $trainerSql
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(f.np) AS BIGINT) AS n_tokens,
       |  CAST(sum(f.cost) AS BIGINT) AS total_cost
       |FROM docwords d JOIN fin f USING (word)
       |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin

  lazy val q131_sql: String =
    s"""WITH RECURSIVE $trainerSql,
       |dtok AS (
       |  SELECT d.doc_id, CAST(sum(f.np) AS BIGINT) AS w
       |  FROM docwords d JOIN fin f USING (word) GROUP BY d.doc_id),
       |t AS (
       |  SELECT doc.source, doc.doc_id, dt.w
       |  FROM documents doc JOIN dtok dt ON dt.doc_id = doc.doc_id),
       |c AS (
       |  SELECT source, doc_id, w,
       |    sum(w) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT source, CAST((cum - w) // ${BpeQueries.PackBudget} AS BIGINT) AS shard,
       |  count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS shard_tokens
       |FROM c GROUP BY source, shard ORDER BY source, shard""".stripMargin

  val queries: Map[String, Q] = Map(
    "q129_unigram_vocab" -> q129_unigram_vocab,
    "q130_unigram_encode" -> q130_unigram_encode,
    "q131_unigram_pack" -> q131_unigram_pack,
    "q132_unigram_persist" -> q132_unigram_persist,
  )
  val oracleSql: Map[String, String] = Map(
    "q129_unigram_vocab" -> q129_sql,
    "q130_unigram_encode" -> q130_sql,
    "q131_unigram_pack" -> q131_sql,
    // serve-from-persisted-vocabulary must reproduce q130 exactly
    "q132_unigram_persist" -> q130_sql,
  )
}
