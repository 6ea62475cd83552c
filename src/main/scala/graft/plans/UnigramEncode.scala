package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) ENCODE as a single codegen'd column
  * kernel: per-document statistics `[n_words, n_tokens, total_cost]`
  * under a FIXED piece→cost vocabulary ([[graft.operators.UnigramLm]] is
  * the training half).
  *
  * Each word is segmented by Viterbi over the piece costs — the
  * minimum-total-surprisal split, exactly the trainer's E-step
  * segmentation (same `segment` code both places, so the trainer==kernel
  * parity is structural; UnigramLmSpec additionally pins the DP against
  * brute-force enumeration). Costs are int64 fixed-point surprisals
  * (`UnigramLm.ilog2fp`), so the whole pass is integer-exact and a SQL
  * oracle replays segmentation — including every tie-break — bit-for-bit.
  *
  * Like [[BpeDocStats]], rows are independent: zero joins, zero shuffles,
  * one scan-speed expression — token-count every document in the same
  * scan that reads it. Word splitting mirrors `Bpe.docWords`: lowercase,
  * split on runs of non-alphanumerics, empties dropped.
  *
  * The reference has no tokenizer (its gatherers count whitespace tokens,
  * kiji-mapreduce KM/lib examples); LLM-pipeline capability upside per
  * the charter.
  */
case class UnigramDocStats(child: Expression,
                           pieces: Array[String], costs: Array[Long],
                           unkCost: Long)
    extends UnaryExpression {
  require(pieces.length == costs.length,
    s"vocab halves differ: ${pieces.length} vs ${costs.length}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_doc_stats expects string, got ${t.simpleString}")
  }

  /** Driver-built lookup state, shipped to executors through the codegen
    * references array (java.util.HashMap is serializable). */
  @transient private lazy val vocabMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costs(i)); i += 1 }
    m
  }
  @transient private lazy val maxPieceLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max

  override protected def nullSafeEval(s: Any): Any =
    UnigramDocStats.docStats(s.asInstanceOf[UTF8String], vocabMap,
      maxPieceLen, unkCost)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("ugVocab", vocabMap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.UnigramDocStats.docStats(" +
        s"$s, $mapRef, $maxPieceLen, ${unkCost}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramDocStats =
    copy(child = newChild)

  override def prettyName: String = "unigram_doc_stats"
}

object UnigramDocStats {
  private val WordSplit = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def docStats(text: UTF8String, vocab: java.util.HashMap[String, java.lang.Long],
               maxPieceLen: Int, unkCost: Long): ArrayData = {
    // UTF8String.toLowerCase IS Spark's lower() — same rationale as
    // BpeDocStats: the kernel's word split must match the trainer's
    // `lower(text)` on every input and locale.
    val words = WordSplit.split(text.toLowerCase.toString)
    var nWords = 0L
    var nToks = 0L
    var totCost = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        nWords += 1
        val (chose, cost) = viterbi(w, vocab, maxPieceLen, unkCost)
        // the forward pass already holds the word's total cost; the
        // backtrack only counts pieces (chose(j) = length of the piece
        // ending at j) — no per-piece lookups in the scan hot path
        totCost += cost(w.length)
        var j = w.length
        while (j > 0) {
          nToks += 1
          j -= chose(j)
        }
      }
      wi += 1
    }
    new GenericArrayData(Array(nWords, nToks, totCost))
  }

  /** Viterbi forward pass: for each end position j (1..len), the length
    * of the piece ending there on the optimal path. Optimality order is
    * (total cost ASC, piece count ASC, piece length DESC) applied at
    * every position — a total order the SQL oracle replays with the
    * identical `ORDER BY c, n, L DESC LIMIT 1` candidate cut, and (per
    * the recursive argument in UnigramLmSpec) globally consistent: the
    * kept prefix at any position is the comparator-minimal prefix.
    *
    * Single characters outside the vocabulary cost `unkCost` (the
    * smoothed count-zero surprisal), so segmentation totality never
    * depends on corpus coverage. */
  def viterbi(word: String, vocab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int, unkCost: Long): (Array[Int], Array[Long]) = {
    val len = word.length
    val cost = new Array[Long](len + 1)
    val np = new Array[Long](len + 1)
    val chose = new Array[Int](len + 1)
    var j = 1
    while (j <= len) {
      var bc = Long.MaxValue
      var bn = Long.MaxValue
      var bl = 0
      var l = 1
      val lMax = if (maxPieceLen < j) maxPieceLen else j
      while (l <= lMax) {
        val c = vocab.get(word.substring(j - l, j))
        val pc: Long =
          if (c != null) c.longValue
          else if (l == 1) unkCost
          else -1L
        if (pc >= 0L) {
          val cc = cost(j - l) + pc
          val nn = np(j - l) + 1
          // iterate L ascending; replace on strictly-better (cost, np)
          // OR tie — so the LARGEST tying L wins (L DESC preference)
          if (cc < bc || (cc == bc && nn <= bn)) { bc = cc; bn = nn; bl = l }
        }
        l += 1
      }
      cost(j) = bc
      np(j) = bn
      chose(j) = bl
      j += 1
    }
    (chose, cost)
  }

  /** The segmentation itself (training E-step side): pieces in word
    * order, derived from the same forward pass as [[docStats]]. */
  def segment(word: String, vocab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int, unkCost: Long): Array[String] = {
    val (chose, _) = viterbi(word, vocab, maxPieceLen, unkCost)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = word.length
    while (j > 0) {
      val from = j - chose(j)
      out += word.substring(from, j)
      j = from
    }
    out.reverseIterator.toArray
  }
}
