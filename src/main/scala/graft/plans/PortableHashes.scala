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

  private[plans] def digest(): MessageDigest = {
    val md = digests.get()
    md.reset()
    md
  }

  /** First `nibbles` hex digits of a digest as a long (big-endian nibble
    * order — exactly the hex-prefix parse). */
  private[plans] def prefixOf(digest: Array[Byte], nibbles: Int): Long = {
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = digest(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** First `nibbles` hex digits of md5 of the string's UTF-8 bytes. */
  def hash(s: UTF8String, nibbles: Int): Long =
    prefixOf(digest().digest(s.getBytes), nibbles)
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
  /** Sort ascending + drop adjacent duplicates, in place. */
  private[plans] def sortedDistinct(out: Array[Long]): ArrayData = {
    val n = out.length
    if (n == 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

  def hashAll(arr: ArrayData, nibbles: Int, distinctSorted: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s == null) throw new IllegalArgumentException(
        "md5_array_long: null array element — gram arrays must be non-null " +
          "(filter or coalesce before hashing)")
      out(i) = Md5PrefixLong.hash(s, nibbles)
      i += 1
    }
    if (distinctSorted) sortedDistinct(out)
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `char_gram_hashes(text, n, nibbles)`: sorted distinct hashes of every
  * n-CHARACTER window of the text, fused into one pass — equivalent to
  * `Md5ArrayLong(array_distinct(charGrams(text, n)))` (property-tested)
  * without materializing a single gram string through the interpreted HOF
  * machinery. Windows are code-point based, matching `substring`'s SQL
  * semantics; an all-ASCII fast path hashes byte windows of the UTF-8
  * buffer directly. Texts shorter than n yield an empty array. */
case class CharGramHashes(child: Expression, n: Int, nibbles: Int)
    extends UnaryExpression {
  require(n >= 1, s"gram length must be >= 1, got $n")
  require(nibbles >= 1 && nibbles <= 15,
    s"nibbles must be 1..15 to stay in signed int64, got $nibbles")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    CharGramHashes.hash(s.asInstanceOf[UTF8String], n, nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.CharGramHashes.hash($s, $n, $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)

  override def prettyName: String = "char_gram_hashes"
}

object CharGramHashes {
  def hash(s: UTF8String, n: Int, nibbles: Int): ArrayData = {
    val numChars = s.numChars()
    if (numChars < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val count = numChars - n + 1
    val out = new Array[Long](count)
    val md = Md5PrefixLong.digest()
    if (s.numBytes() == numChars) {
      // all-ASCII: byte windows ARE the grams' UTF-8 bytes
      val base = s.getBytes
      var i = 0
      while (i < count) {
        md.reset()
        md.update(base, i, n)
        out(i) = Md5PrefixLong.prefixOf(md.digest(), nibbles)
        i += 1
      }
    } else {
      var i = 0
      while (i < count) {
        md.reset()
        out(i) = Md5PrefixLong.prefixOf(
          md.digest(s.substring(i, i + n).getBytes), nibbles)
        i += 1
      }
    }
    Md5ArrayLong.sortedDistinct(out)
  }
}

/** `word_shingle_hashes(text, n, nibbles)`: sorted distinct hashes of the
  * space-joined n-token windows of `split(lower(text), "\\s+")` — fused
  * equivalent of `Md5ArrayLong(array_distinct(shingles(text, n)))`
  * (property-tested), mirroring the composed form's exact tokenization
  * (UTF8String lowercase, Java regex split with limit -1, including its
  * leading/trailing empty-token behavior). Fewer than n tokens yields an
  * empty array. */
case class WordShingleHashes(child: Expression, n: Int, nibbles: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle length must be >= 1, got $n")
  require(nibbles >= 1 && nibbles <= 15,
    s"nibbles must be 1..15 to stay in signed int64, got $nibbles")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    WordShingleHashes.hash(s.asInstanceOf[UTF8String], n, nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.WordShingleHashes.hash($s, $n, $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hashes"
}

object WordShingleHashes {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Per-POSITION shingle hashes: element i is the hash of the window
    * starting at token i (0-based), duplicates kept. */
  def hashSeq(s: UTF8String, n: Int, nibbles: Int): Array[Long] = {
    // Mirror split(lower(text), "\s+"): UTF8String lowercase, Java regex
    // split with limit -1 (trailing empties kept, as Spark's split does).
    val toks = Whitespace.split(s.toLowerCase.toString, -1)
    if (toks.length < n) return Array.emptyLongArray
    val count = toks.length - n + 1
    val out = new Array[Long](count)
    val md = Md5PrefixLong.digest()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      out(i) = Md5PrefixLong.prefixOf(
        md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
        nibbles)
      i += 1
    }
    out
  }

  def hash(s: UTF8String, n: Int, nibbles: Int): ArrayData =
    Md5ArrayLong.sortedDistinct(hashSeq(s, n, nibbles))

  def hashSeqData(s: UTF8String, n: Int, nibbles: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      hashSeq(s, n, nibbles))
}

/** `word_shingle_hash_seq(text, n, nibbles)`: the POSITIONAL variant of
  * [[WordShingleHashes]] — element i is the hash of the n-token window
  * starting at token i, duplicates kept, order = text order. This is the
  * span-level alphabet: `posexplode` recovers (start, hash) pairs with no
  * gram strings ever materialized (the composed
  * `transform(sequence, i -> hash(array_join(slice(...))))` form walks an
  * interpreted higher-order lambda per window — HOFs sit outside
  * whole-stage codegen). Property-tested value-identical to the composed
  * form. */
case class WordShingleHashSeq(child: Expression, n: Int, nibbles: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle length must be >= 1, got $n")
  require(nibbles >= 1 && nibbles <= 15,
    s"nibbles must be 1..15 to stay in signed int64, got $nibbles")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hash_seq expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    WordShingleHashes.hashSeqData(s.asInstanceOf[UTF8String], n, nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.WordShingleHashes.hashSeqData($s, $n, $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashSeq =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hash_seq"
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

/** `token_stats(text)`: all five per-document repetition statistics in ONE
  * native pass — word count, distinct words, max per-word frequency,
  * bigram count, distinct bigrams — over the same tokenization as
  * `split(lower(text), "\s+")` (UTF8String lowercase, Java regex split,
  * trailing empties kept). Exact string counting (HashMap / HashSet), no
  * hashing, so the result is collision-free and oracle-identical.
  *
  * Replaces an interpreted HOF chain (array_sort + struct-accumulator
  * fold + two array_distinct walks) that re-evaluated per column and
  * measured ~2-4x slower at sf0.1; this is the "custom native Expression
  * beats composed interpreted expressions" tier of the build plan.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    TokenStats.stats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.TokenStats.stats($s);")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)

  override def prettyName: String = "token_stats"
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false)))

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Named `stats`, not `eval`: the case class inherits Expression.eval,
    * which makes scalac suppress a same-named static forwarder — codegen
    * would then emit a call that Janino cannot compile and the whole
    * stage would silently fall back to interpretation. */
  def stats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = Whitespace.split(s.toLowerCase.toString, -1)
    val counts = new java.util.HashMap[String, Long](toks.length * 2)
    var top = 0L
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    val bigrams = new java.util.HashSet[String](toks.length * 2)
    i = 0
    while (i + 1 < toks.length) {
      bigrams.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      toks.length.toLong, counts.size.toLong, top,
      math.max(toks.length - 1, 0).toLong, bigrams.size.toLong))
  }
}
