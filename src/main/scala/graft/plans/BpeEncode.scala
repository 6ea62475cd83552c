package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE greedy ENCODE as a single codegen'd column kernel: per-document
  * token statistics `[n_words, n_tokens, max_tok_len]` under a FIXED
  * merge list — the inference half of the tokenizer ([[graft.operators.Bpe]]
  * is the training half).
  *
  * Training replays merges relationally (windows over the distinct-word
  * token table) because the merge LIST is still being discovered; encoding
  * against a known vocabulary needs none of that — each row is independent,
  * so the whole pass is one scan-speed expression: zero joins, zero
  * shuffles, zero iterations over the corpus. At 100 TB this is the
  * difference between a pipeline stage and a pipeline: token-count every
  * document in the same scan that reads it.
  *
  * Merge application is the sequential leftmost-nonoverlapping greedy pass
  * per merge, in rank order — EXACTLY the trainer's run-parity window
  * semantics (BpeSpec proves the equivalence on the trained corpus), so an
  * oracle replaying the trainer's CTE chain verifies this kernel too.
  * Word splitting mirrors `Bpe.docWords`: lowercase, split on runs of
  * non-alphanumerics, empties dropped.
  */
case class BpeDocStats(child: Expression,
                       lhs: Array[String], rhs: Array[String])
    extends UnaryExpression {
  require(lhs.length == rhs.length,
    s"merge list halves differ: ${lhs.length} vs ${rhs.length}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_doc_stats expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    BpeDocStats.docStats(s.asInstanceOf[UTF8String], lhs, rhs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lhsRef = ctx.addReferenceObj("bpeLhs", lhs, "java.lang.String[]")
    val rhsRef = ctx.addReferenceObj("bpeRhs", rhs, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.BpeDocStats.docStats($s, $lhsRef, $rhsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDocStats =
    copy(child = newChild)

  override def prettyName: String = "bpe_doc_stats"
}

object BpeDocStats {
  private val WordSplit = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def docStats(text: UTF8String, lhs: Array[String],
               rhs: Array[String]): ArrayData = {
    // UTF8String.toLowerCase IS Spark's lower() — byte-wise for ASCII,
    // default-locale slow path otherwise. Calling it (instead of
    // String.toLowerCase(ROOT)) makes the kernel's word split identical
    // to the trainer's `lower(text)` on every input and locale, which
    // q97's shared-oracle proof depends on.
    val words = WordSplit.split(text.toLowerCase.toString)
    var nWords = 0L
    var nToks = 0L
    var maxLen = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        nWords += 1
        val toks = encode(w, lhs, rhs)
        nToks += toks.length
        var ti = 0
        while (ti < toks.length) {
          if (toks(ti).length > maxLen) maxLen = toks(ti).length.toLong
          ti += 1
        }
      }
      wi += 1
    }
    new GenericArrayData(Array(nWords, nToks, maxLen))
  }

  /** Apply the merge list in rank order; each merge is one sequential
    * leftmost-nonoverlapping pass (identical to the trainer's run-parity
    * result). Arrays + index juggling, no per-token allocation beyond the
    * merged strings themselves. */
  def encode(word: String, lhs: Array[String],
             rhs: Array[String]): Array[String] = {
    var toks = new Array[String](word.length)
    var i = 0
    while (i < word.length) { toks(i) = String.valueOf(word.charAt(i)); i += 1 }
    var mi = 0
    while (mi < lhs.length && toks.length > 1) {
      val l = lhs(mi)
      val r = rhs(mi)
      val out = new Array[String](toks.length)
      var n = 0
      var j = 0
      while (j < toks.length) {
        if (j + 1 < toks.length && toks(j) == l && toks(j + 1) == r) {
          out(n) = l + r; n += 1; j += 2
        } else {
          out(n) = toks(j); n += 1; j += 1
        }
      }
      toks = java.util.Arrays.copyOf(out, n)
      mi += 1
    }
    toks
  }
}
