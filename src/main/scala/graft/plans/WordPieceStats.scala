package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The WordPiece vocabulary as a task-shippable lookup: head pieces
  * (legal at word start) and continuation pieces (legal after), with the
  * hash sets and max piece length built once per task — the
  * [[GroupedL2Seeds]] economics (driver builds, tasks look up).
  * Vocabulary size is bounded by training (distinct pieces of the final
  * token table), never the corpus. */
final case class WpLookup(head: Array[String], cont: Array[String]) {
  @transient lazy val headSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](head.length * 2)
    head.foreach(s.add); s
  }
  @transient lazy val contSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](cont.length * 2)
    cont.foreach(s.add); s
  }
  @transient lazy val maxPieceLen: Int =
    (head.iterator ++ cont.iterator).map(_.length).foldLeft(1)(math.max)
  override def toString: String =
    s"WpLookup(${head.length} head, ${cont.length} cont)"
}

/** `wordpiece_doc_stats(text)`: per-document WordPiece encode statistics
  * `[n_words, n_tokens, n_unk]` under a FIXED trained vocabulary — one
  * codegen'd scan-speed expression, zero joins (the [[BpeDocStats]]
  * economics for the WordPiece family).
  *
  * Per word (lowercased, split on non-alphanumeric runs, as the
  * trainer): greedy longest-match left to right — the longest HEAD piece
  * at offset 0, the longest CONTINUATION piece after; a dead end, or a
  * word longer than `maxChars` (HuggingFace max_input_chars_per_word),
  * makes the whole word ONE [UNK] token. `maxChars` bounds the oracle's
  * unrolled replay: every non-dead step consumes ≥ 1 char.
  */
case class WordPieceStats(child: Expression, vocab: WpLookup, maxChars: Int)
    extends UnaryExpression {
  require(maxChars > 0, s"maxChars must be positive: $maxChars")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_doc_stats expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    WordPieceStats.docStats(s.asInstanceOf[UTF8String], vocab, maxChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("wpVocab", vocab, classOf[WpLookup].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.WordPieceStats.docStats($s, $vRef, $maxChars);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceStats =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_doc_stats"
}

object WordPieceStats {
  private val WordSplit = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def docStats(text: UTF8String, vocab: WpLookup, maxChars: Int): ArrayData = {
    // UTF8String.toLowerCase == Spark's lower(), as BpeDocStats documents
    val words = WordSplit.split(text.toLowerCase.toString)
    var nWords = 0L
    var nToks = 0L
    var nUnk = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        nWords += 1
        val t = encodeCount(w, vocab, maxChars)
        if (t < 0) { nUnk += 1; nToks += 1 } // whole word -> one [UNK]
        else nToks += t
      }
      wi += 1
    }
    new GenericArrayData(Array(nWords, nToks, nUnk))
  }

  /** Greedy longest-match token count for one word; -1 means [UNK]
    * (over-length or dead end). */
  def encodeCount(word: String, vocab: WpLookup, maxChars: Int): Long = {
    if (word.length > maxChars) return -1L
    var off = 0
    var n = 0L
    while (off < word.length) {
      val set = if (off == 0) vocab.headSet else vocab.contSet
      var len = math.min(vocab.maxPieceLen, word.length - off)
      var matched = 0
      while (matched == 0 && len >= 1) {
        if (set.contains(word.substring(off, off + len))) matched = len
        else len -= 1
      }
      if (matched == 0) return -1L
      off += matched
      n += 1L
    }
    n
  }
}
