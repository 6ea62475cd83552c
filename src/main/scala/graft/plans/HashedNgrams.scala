package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hashed_ngram_buckets(text, buckets)`: the DSIR feature map — every
  * word UNIGRAM and adjacent word BIGRAM of the document hashed into a
  * fixed bucket space, one bucket id per feature occurrence, in text
  * order (unigrams first, then bigrams; duplicates kept — these are
  * COUNTS, not a set). Tokenization mirrors `Bpe.docWords`: lowercase,
  * split on runs of non-alphanumerics, empties dropped; the bigram
  * feature string is `w1 ⊔ w2` (space-joined), which cannot collide
  * with any unigram (unigrams contain no spaces). Bucket = the portable
  * 7-nibble md5 prefix ([[Md5PrefixLong]]) mod `buckets` — the DuckDB
  * side is `('0x' || substr(md5(feat), 1, 7))::BIGINT % buckets`.
  *
  * Hashed bag-of-ngrams is the feature space of Data Selection via
  * Importance Resampling (DSIR, Xie et al. 2023); one codegen'd pass
  * per document keeps the 100 TB scoring loop at scan speed.
  */
case class HashedNgramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_ngram_buckets expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    HashedNgramBuckets.bucketsOf(s.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.HashedNgramBuckets.bucketsOf($s, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): HashedNgramBuckets =
    copy(child = newChild)

  override def prettyName: String = "hashed_ngram_buckets"
}

object HashedNgramBuckets {
  private val WordSplit = java.util.regex.Pattern.compile("[^a-z0-9]+")
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  def bucketsOf(text: UTF8String, buckets: Int): ArrayData = {
    // UTF8String.toLowerCase IS Spark's lower() — keeps the word split
    // identical to the oracle's `lower(text)` on every input and locale
    // (the BpeDocStats rationale).
    val raw = WordSplit.split(text.toLowerCase.toString)
    var n = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) n += 1; i += 1 }
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val words = new Array[String](n)
    var w = 0
    i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { words(w) = raw(i); w += 1 }
      i += 1
    }
    val out = new Array[Long](n + math.max(n - 1, 0))
    val md = Md5PrefixLong.digest()
    i = 0
    while (i < n) {
      md.reset()
      out(i) = Md5PrefixLong.prefixOf(
        md.digest(words(i).getBytes(Utf8)), 7) % buckets
      i += 1
    }
    i = 0
    while (i + 1 < n) {
      md.reset()
      out(n + i) = Md5PrefixLong.prefixOf(
        md.digest((words(i) + " " + words(i + 1)).getBytes(Utf8)), 7) % buckets
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `bucket_weight_sum(bs, weights)`: Σ over a bucket-id array of the
  * task-literal weight table — the per-document importance score of the
  * DSIR selection (weights = fixed-point log-ratio of smoothed target
  * vs raw bucket counts, computed driver-side from one bounded
  * aggregation). The weight array rides the generated code as a
  * reference object ([[GroupedNearestL2]]'s economics): ~buckets × 8
  * bytes shipped once per task, zero joins, zero shuffles in the
  * scoring pass. */
case class BucketWeightSum(child: Expression, weights: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bucket_weight_sum expects array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    BucketWeightSum.sum(a.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bucketWeights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.BucketWeightSum.sum($a, $wRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketWeightSum =
    copy(child = newChild)

  override def prettyName: String = "bucket_weight_sum"
}

object BucketWeightSum {
  def sum(bs: ArrayData, weights: Array[Long]): Long = {
    val n = bs.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += weights(bs.getLong(i).toInt)
      i += 1
    }
    acc
  }
}
