package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_boundaries(text)`: CONTENT-DEFINED chunk boundaries (Rabin-style
  * rolling fingerprint), as the sorted array of 1-based chunk END
  * positions — the chunking that makes chunk-level dedup robust to
  * INSERTIONS: a fixed-width chunker misaligns every chunk after an
  * edit, while content-defined cut points re-synchronize as soon as the
  * rolling window clears the edit (the rsync/LBFS economics, applied to
  * corpus text dedup).
  *
  * Definition (exact, engine-portable int64 arithmetic — the oracle
  * replays it relationally):
  *
  *   fp(i) = Σ_{d=0..W-1} char(i−d) · B^d   (mod 2^40)
  *   position i (1-based, i ≥ W) is a cut  iff  fp(i) mod M = 0
  *   chunk ends = cuts ∪ {len(text)}  (ascending; empty text → none)
  *
  * with B = 31, W = 16, modulus 2^40 (power of two, so the rolling
  * update is one AND), and M the expected-chunk-length knob. The kernel
  * is exact for EVERY code point (up to U+10FFFF): intermediates may
  * exceed 2^63, but Scala long arithmetic wraps mod 2^64 and the final
  * mask takes the result mod 2^40 — a divisor of 2^64, so the wrap is
  * harmless. The oracle computes the same window sum with a W-row power
  * literal join, each ch·B^d term reduced mod 2^40 BEFORE summing
  * (DuckDB BIGINT overflow is a loud error, and 16 unreduced astral
  * terms reach ~2^65; reduced terms keep the sum < 2^44).
  *
  * Per-row linear scan, zero state across rows — the usual scan-speed
  * kernel economics (chunk CONTENT hashing happens outside, in plain
  * `md5(substr(...))`, portable to the oracle). */
case class CdcBoundaries(child: Expression, avgMask: Int)
    extends UnaryExpression {
  require(avgMask > 0, s"avgMask must be positive: $avgMask")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_boundaries expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    CdcBoundaries.boundaries(s.asInstanceOf[UTF8String], avgMask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.CdcBoundaries.boundaries($s, $avgMask);")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)

  override def prettyName: String = "cdc_boundaries"
}

object CdcBoundaries {
  val B = 31L
  val W = 16
  val Mod: Long = 1L << 40
  private val TopPow: Long = { // B^(W-1) mod 2^40
    var p = 1L
    var d = 0
    while (d < W - 1) { p = (p * B) & (Mod - 1); d += 1 }
    p
  }

  def boundaries(text: UTF8String, avgMask: Int): ArrayData = {
    // CODE POINT positions, not UTF-16 units: the emitted ends feed
    // substring()/substr() in both engines, which count code points
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Int])
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ring = new Array[Long](W)
    var fp = 0L
    var i = 0 // code points consumed so far
    var j = 0 // UTF-16 cursor
    while (j < s.length) {
      val c = s.codePointAt(j).toLong
      fp =
        if (i < W) ((fp * B) + c) & (Mod - 1)
        else (((fp - (ring(i % W) * TopPow)) * B + c) & (Mod - 1))
      ring(i % W) = c
      i += 1
      // 1-based position i; eligible once the window is full
      if (i >= W && fp % avgMask == 0) out += i
      j += Character.charCount(c.toInt)
    }
    if (out.isEmpty || out.last != i) out += i
    new GenericArrayData(out.toArray)
  }
}
