package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `md5_prefix_long(s, nibbles)`: the first `nibbles` hex digits of
  * md5(utf8(s)) as a long — the portable cross-engine hash
  * (DuckDB: `('0x' || substr(md5(s), 1, nibbles))::BIGINT`), produced
  * straight from the digest bytes.
  *
  * Value-identical to `conv(substring(md5(cast(s AS BINARY)), 1, n), 16,
  * 10)` (property-tested), but skips that chain's per-row work: the
  * 32-char hex encode, the substring, and the radix-16 string parse.
  * This hash runs once per GRAM in the dedup pipelines — millions of
  * times per batch — so the constant matters.
  */
case class Md5PrefixLong(child: Expression, nibbles: Int)
    extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15,
    s"nibbles must be 1..15 to stay in signed int64, got $nibbles")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    Md5PrefixLong.hash(s.asInstanceOf[UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.Md5PrefixLong.hash($s, $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix_long"
}

object Md5PrefixLong {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First `nibbles` hex digits of md5 of the string's UTF-8 bytes, as a
    * long (big-endian nibble order — exactly the hex-prefix parse). */
  def hash(s: UTF8String, nibbles: Int): Long = {
    val md = digests.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = digest(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

/** `simhash_of_hashes(hs, bits)`: frequency-weighted SimHash folded from a
  * precomputed token-hash array in ONE pass — every hash votes ±1 on each
  * of `bits` bit positions, bit j of the result is set iff its vote sum is
  * positive. Semantically identical to the `bits`-fold of
  * `aggregate(hs, …)` HOF columns (property-tested), but the HOF form
  * walks the array once PER BIT with per-element lambda machinery; this is
  * one tight nested loop per row. */
case class SimhashOfHashes(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits must be 1..63, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_of_hashes expects array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    SimhashOfHashes.fold(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.SimhashOfHashes.fold($a, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimhashOfHashes =
    copy(child = newChild)

  override def prettyName: String = "simhash_of_hashes"
}

/** `md5_array_long(arr, nibbles, distinctSorted)`: [[Md5PrefixLong]] over
  * every element of a string array in one native pass. With
  * `distinctSorted` the result is deduplicated and sorted ascending —
  * value-identical to `array_sort(array_distinct(transform(arr,
  * hash)))`, which costs three interpreted HOF array walks (lambda
  * bodies are CodegenFallback) plus per-element hex encode/parse. This
  * is the gram-hashing step of every dedup pipeline: the hot loop of the
  * whole corpus scan. */
case class Md5ArrayLong(child: Expression, nibbles: Int, distinctSorted: Boolean)
    extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15,
    s"nibbles must be 1..15 to stay in signed int64, got $nibbles")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_array_long expects array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    Md5ArrayLong.hashAll(a.asInstanceOf[ArrayData], nibbles, distinctSorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Md5ArrayLong.hashAll($a, $nibbles, $distinctSorted);")

  override protected def withNewChildInternal(newChild: Expression): Md5ArrayLong =
    copy(child = newChild)

  override def prettyName: String = "md5_array_long"
}

object Md5ArrayLong {
  def hashAll(arr: ArrayData, nibbles: Int, distinctSorted: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Md5PrefixLong.hash(arr.getUTF8String(i), nibbles)
      i += 1
    }
    if (!distinctSorted || n == 0)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    else {
      java.util.Arrays.sort(out)
      var w = 1
      var r = 1
      while (r < n) {
        if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
        r += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        if (w == n) out else java.util.Arrays.copyOf(out, w))
    }
  }
}

/** `minhash_signature(ghash, k)`: the k affine minhashes
  * `min_g((A_j·g + B_j) mod P)` of a pre-hashed gram array, computed in
  * ONE pass (per gram, an inner loop of k fused multiply-mods) instead of
  * k interpreted `array_min(transform(…))` walks. Empty gram arrays yield
  * null — the `array_min([]) = null` semantics the banded join relies on
  * (null band keys never match). Constants are the shared graft minhash
  * family (`hashA`/`hashB`/[[MinhashSignature.Prime]]), identical to the
  * oracle's SQL re-hash. */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty gram set -> null signature

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    MinhashSignature.signature(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.plans.MinhashSignature.signature($a, $numHashes);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinhashSignature {
  /** 2^31 - 1 — the shared modulus of the affine re-hash family. */
  val Prime = 2147483647L
  def hashA(j: Int): Long = 1L + 2L * j
  def hashB(j: Int): Long = 12345L + 777L * j

  /** Null for an empty gram array (mirrors `array_min([])`). */
  def signature(ghash: ArrayData, k: Int): ArrayData = {
    val n = ghash.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = ghash.getLong(i)
      var j = 0
      while (j < k) {
        val v = (hashA(j) * h + hashB(j)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

object SimhashOfHashes {
  def fold(hs: ArrayData, bits: Int): Long = {
    val n = hs.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sim |= 1L << j
      j += 1
    }
    sim
  }
}
