package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bpe, WordPiece}

/** WordPiece tokenizer queries over the `documents` table — the third
  * subword family (q95-q99 BPE, q129-q136/q140 unigram-LM), so the engine
  * covers BERT-style WordPiece end to end: likelihood-scored merge
  * induction (q148), greedy longest-match encoding through the codegen'd
  * kernel (q149), and the persisted-vocabulary serve (q150).
  *
  * The oracle replays EVERYTHING relationally: each training round is an
  * unrolled CTE block (pair counts + per-token frequencies → the
  * fixed-point likelihood argmax → run-parity merge application), and the
  * greedy encode is [[MaxWpChars]] unrolled longest-match steps over the
  * distinct-word table (each non-dead step consumes ≥ 1 char, so the
  * unroll is exhaustive by construction — the same bounding trick
  * HuggingFace's max_input_chars_per_word applies, with the same [UNK]
  * semantics for over-length words).
  */
object WordPieceQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Merge rounds — matches BpeQueries' readable-oracle budget. */
  val WpMerges = 6

  /** max_input_chars_per_word: longer words become one [UNK]. Bounds the
    * oracle's unrolled greedy loop. */
  val MaxWpChars = 12

  private val Scale = 1L << 40

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  val q148_wordpiece_vocab: Q = (s, d) => {
    import s.implicits._
    val wf = Bpe.wordFreq(Bpe.docWords(docs(s, d), "doc_id", "text"))
    val (merges, _) = WordPiece.trainAuto(wf, WpMerges)
    merges.toDF().select($"step", $"lhs", $"rhs", $"cnt", $"skey")
      .orderBy($"step")
  }

  val q149_wordpiece_encode: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val (_, finalToks) = WordPiece.trainAuto(
      Bpe.wordFreq(Bpe.docWords(docs(s, d), "doc_id", "text")), WpMerges)
    val v = WordPiece.vocabOf(finalToks)
    docs(s, d)
      .select($"doc_id",
        columnOf(graft.plans.WordPieceStats(expressionOf($"text"),
          graft.plans.WpLookup(v.head, v.cont), MaxWpChars)).as("st"))
      .select($"doc_id", element_at($"st", 1).as("n_words"),
        element_at($"st", 2).as("n_tokens"),
        element_at($"st", 3).as("n_unk"))
      .filter($"n_words" > 0) // mirror the oracle's inner join on words
      .orderBy($"doc_id")
  }

  // ── q150: WordPiece vocabulary persistence — train once, persist the
  // (piece, is_cont) table as parquet, load it back, and encode with the
  // kernel driven by the LOADED vocabulary; the WordPiece face of the
  // persistable-artifact convention (q112 BPE merges, q132 unigram
  // pieces, the index tiers). Lossless roundtrip (strings + booleans), so
  // the served encode must reproduce q149 bit-for-bit: the oracle IS
  // q149's SQL. ──────────────────────────────────────────────────────────
  val q150_wordpiece_vocab_persist: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val (_, finalToks) = WordPiece.trainAuto(
      Bpe.wordFreq(Bpe.docWords(docs(s, d), "doc_id", "text")), WpMerges)
    val path = QueryTmp.dir("wpvocab", d)
    WordPiece.saveVocab(WordPiece.vocabOf(finalToks), s, path)
    val v = WordPiece.loadVocab(s, path)
    docs(s, d)
      .select($"doc_id",
        columnOf(graft.plans.WordPieceStats(expressionOf($"text"),
          graft.plans.WpLookup(v.head, v.cont), MaxWpChars)).as("st"))
      .select($"doc_id", element_at($"st", 1).as("n_words"),
        element_at($"st", 2).as("n_tokens"),
        element_at($"st", 3).as("n_unk"))
      .filter($"n_words" > 0)
      .orderBy($"doc_id")
  }

  /** The WordPiece trainer chain: BPE's prologue and run-parity merge
    * application (see BpeQueries.trainerSqlFrom) with the likelihood
    * argmax — per-round token frequencies tf$i, pair scores
    * `skey = cnt·2^40 // (fl·fr)` in HUGEINT (exact, matching Spark's
    * DECIMAL(38,0) div), winner by (skey DESC, lhs, rhs). */
  private def wpTrainerSql: String = {
    def round(i: Int): String =
      s"""w$i AS MATERIALIZED (
         |  SELECT word, pos, tok,
         |    lead(tok) OVER (PARTITION BY word ORDER BY pos) AS ntok
         |  FROM t${i - 1}),
         |tf$i AS (
         |  SELECT t.tok, CAST(sum(f.freq) AS BIGINT) AS tf
         |  FROM t${i - 1} t JOIN wf f USING (word) GROUP BY t.tok),
         |p$i AS (
         |  SELECT w.tok AS lhs, w.ntok AS rhs,
         |    CAST(sum(f.freq) AS BIGINT) AS cnt
         |  FROM w$i w JOIN wf f USING (word) WHERE w.ntok IS NOT NULL
         |  GROUP BY w.tok, w.ntok),
         |ps$i AS (
         |  SELECT p.lhs, p.rhs, p.cnt,
         |    CAST((CAST(p.cnt AS HUGEINT) * $Scale)
         |      // (CAST(l.tf AS HUGEINT) * CAST(r.tf AS HUGEINT))
         |      AS BIGINT) AS skey
         |  FROM p$i p JOIN tf$i l ON p.lhs = l.tok
         |  JOIN tf$i r ON p.rhs = r.tok),
         |m$i AS (
         |  SELECT lhs, rhs, cnt, skey FROM (
         |    SELECT lhs, rhs, cnt, skey FROM ps$i
         |    ORDER BY skey DESC, lhs, rhs LIMIT 1)
         |  UNION ALL
         |  SELECT '' AS lhs, '' AS rhs, CAST(0 AS BIGINT) AS cnt,
         |    CAST(0 AS BIGINT) AS skey
         |  WHERE NOT EXISTS (SELECT 1 FROM ps$i)),
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
       |    FROM documents)
       |  WHERE word <> ''),
       |wf AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM docwords GROUP BY word),
       |t0 AS MATERIALIZED (
       |  SELECT word, i - 1 AS pos, substr(word, i, 1) AS tok FROM (
       |    SELECT word,
       |      CAST(unnest(generate_series(1, length(word))) AS INT) AS i
       |    FROM wf)),
       |${(1 to WpMerges).map(round).mkString(",\n")}""".stripMargin
  }

  lazy val q148_sql: String = {
    val steps = (1 to WpMerges)
      .map(i => s"SELECT $i AS step, lhs, rhs, cnt, skey FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH $wpTrainerSql
       |SELECT step, lhs, rhs, cnt, skey FROM ($steps)
       |WHERE lhs <> '' ORDER BY step""".stripMargin
  }

  /** The greedy encode, unrolled: state s$i(word, off, ntok, unk, done);
    * step i joins the live states to the vocabulary on the longest piece
    * matching at `off` for the position class (head at 0, continuation
    * after), a dead end or over-length word collapsing to one [UNK]. */
  lazy val q149_sql: String = {
    def step(i: Int): String =
      s"""c$i AS MATERIALIZED (
         |  SELECT s.word, max(length(v.piece)) AS blen
         |  FROM s${i - 1} s JOIN wpv v
         |    ON v.is_cont = (s.off > 0)
         |   AND substr(s.word, s.off + 1, length(v.piece)) = v.piece
         |  WHERE NOT s.done
         |  GROUP BY s.word),
         |s$i AS MATERIALIZED (
         |  SELECT s.word,
         |    CASE WHEN s.done OR c.blen IS NULL THEN s.off
         |      ELSE s.off + c.blen END AS off,
         |    CASE WHEN s.done OR c.blen IS NULL THEN s.ntok
         |      ELSE s.ntok + 1 END AS ntok,
         |    CASE WHEN NOT s.done AND c.blen IS NULL THEN TRUE
         |      ELSE s.unk END AS unk,
         |    (s.done OR c.blen IS NULL
         |      OR s.off + coalesce(c.blen, 0) >= length(s.word)) AS done
         |  FROM s${i - 1} s LEFT JOIN c$i c USING (word))""".stripMargin
    s"""WITH $wpTrainerSql,
       |wpv AS MATERIALIZED (
       |  SELECT DISTINCT tok AS piece, (pos > 0) AS is_cont
       |  FROM t$WpMerges),
       |s0 AS MATERIALIZED (
       |  SELECT word, 0 AS off, CAST(0 AS BIGINT) AS ntok,
       |    (length(word) > $MaxWpChars) AS unk,
       |    (length(word) > $MaxWpChars) AS done
       |  FROM wf),
       |${(1 to MaxWpChars).map(step).mkString(",\n")},
       |wenc AS (
       |  SELECT word,
       |    CASE WHEN unk THEN 1 ELSE ntok END AS wt,
       |    CASE WHEN unk THEN 1 ELSE 0 END AS wu
       |  FROM s$MaxWpChars)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(e.wt) AS BIGINT) AS n_tokens,
       |  CAST(sum(e.wu) AS BIGINT) AS n_unk
       |FROM docwords d JOIN wenc e USING (word)
       |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q148_wordpiece_vocab" -> q148_wordpiece_vocab,
    "q149_wordpiece_encode" -> q149_wordpiece_encode,
    "q150_wordpiece_vocab_persist" -> q150_wordpiece_vocab_persist,
  )
  val oracleSql: Map[String, String] = Map(
    "q148_wordpiece_vocab" -> q148_sql,
    "q149_wordpiece_encode" -> q149_sql,
    // serve-from-persisted-vocabulary must reproduce q149 exactly
    "q150_wordpiece_vocab_persist" -> q149_sql,
  )
}
