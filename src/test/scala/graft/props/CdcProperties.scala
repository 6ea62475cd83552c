package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

import graft.plans.CdcBoundaries

/** Property checks for the CDC boundary kernel against the direct
  * (non-rolling) window-sum model the DuckDB oracle replays — the
  * rolling-subtract update must agree with the definitional sum for
  * EVERY code point, including multi-byte BMP and astral ones, and for
  * texts shorter than, exactly at, and longer than the window W. Pure
  * expression eval (no Spark jobs), so the case count can be high. */
object CdcProperties extends Properties("cdc") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(300)

  /** Direct window-sum model: fp(i) = Σ_{d<W} cp(i−d)·B^d mod 2^40,
    * each term reduced before the sum (the oracle's formulation). */
  private def modelEnds(s: String, mask: Int): Seq[Int] = {
    val w = CdcBoundaries.W
    val m = CdcBoundaries.Mod
    val cps = s.codePoints().toArray
    val pows = Array.iterate(1L, w)(p => (p * CdcBoundaries.B) % m)
    val cuts = (w to cps.length).filter { i =>
      val fp = (0 until w).map(d => (cps(i - 1 - d) * pows(d)) % m).sum % m
      fp % mask == 0
    }
    if (cps.isEmpty) Seq.empty
    else if (cuts.nonEmpty && cuts.last == cps.length) cuts
    else cuts :+ cps.length
  }

  private def kernelEnds(s: String, mask: Int): Seq[Int] = {
    val arr = CdcBoundaries.boundaries(UTF8String.fromString(s), mask)
    arr.toIntArray().toSeq
  }

  // code points spanning every UTF-8 width: ASCII, 2-byte (é), 3-byte
  // CJK, and 4-byte astral (emoji / Deseret) — the encodings where a
  // UTF-16-unit / code-point confusion would shift every boundary
  private val cpGen: Gen[Int] = Gen.frequency(
    6 -> Gen.choose(' '.toInt, '~'.toInt),
    2 -> Gen.oneOf('é'.toInt, 'ß'.toInt, 'λ'.toInt, 'ж'.toInt),
    2 -> Gen.oneOf('中'.toInt, '語'.toInt, '한'.toInt, 0x2603),
    2 -> Gen.oneOf(0x1F600, 0x1F680, 0x10400, 0x10FFFF))

  // lengths clustered around the window edge: 0, W−1, W, W+1 all likely
  private val textGen: Gen[String] = for {
    n <- Gen.frequency(
      2 -> Gen.choose(0, CdcBoundaries.W + 2),
      3 -> Gen.choose(CdcBoundaries.W, 120))
    cps <- Gen.listOfN(n, cpGen)
  } yield cps.map(Character.toChars(_).mkString).mkString

  private val maskGen: Gen[Int] = Gen.oneOf(1, 2, 4, 8, 16, 32, 64)

  property("rolling kernel == definitional window sum") =
    forAll(textGen, maskGen) { (s, mask) =>
      kernelEnds(s, mask) == modelEnds(s, mask)
    }

  property("ends are ascending code-point positions closing the text") =
    forAll(textGen, maskGen) { (s, mask) =>
      val ends = kernelEnds(s, mask)
      val n = s.codePointCount(0, s.length)
      if (n == 0) ends.isEmpty
      else ends == ends.sorted && ends.distinct == ends &&
        ends.last == n && ends.head >= 1 &&
        // chunks reassemble the text when sliced by CODE POINTS — the
        // contract substr()/substring() relies on in both engines
        (0 +: ends.init).zip(ends).map { case (a, b) =>
          s.substring(s.offsetByCodePoints(0, a), s.offsetByCodePoints(0, b))
        }.mkString == s
    }

  property("mask=1 cuts at every position once the window fills") =
    forAll(textGen) { s =>
      val n = s.codePointCount(0, s.length)
      val ends = kernelEnds(s, 1)
      if (n == 0) ends.isEmpty
      else if (n < CdcBoundaries.W) ends == Seq(n)
      else ends == (CdcBoundaries.W to n).toSeq
    }
}
