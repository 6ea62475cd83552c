package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.CdcBoundaries

class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: direct window-sum fingerprints, no rolling
    * state — the oracle's formulation. */
  private def bruteEnds(s: String, mask: Int): Seq[Int] = {
    val w = CdcBoundaries.W
    val cps = s.codePoints().toArray
    val cuts = (w to cps.length).filter { i =>
      val fp = (0 until w).map { d =>
        val powMod = (BigInt(CdcBoundaries.B).pow(d) mod
          BigInt(CdcBoundaries.Mod)).toLong
        (cps(i - 1 - d).toLong * powMod) & (CdcBoundaries.Mod - 1)
      }.sum % CdcBoundaries.Mod
      fp % mask == 0
    }
    if (cps.isEmpty) Seq.empty
    else if (cuts.nonEmpty && cuts.last == cps.length) cuts
    else cuts :+ cps.length
  }

  private def kernelEnds(s: String, mask: Int): Seq[Int] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    Seq(s).toDF("text")
      .select(columnOf(CdcBoundaries(expressionOf($"text"), mask)).as("e"))
      .head().getSeq[Int](0)
  }

  test("rolling kernel == brute-force window fingerprints; final end always present") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog repeatedly and often",
      "spark join hash row batch scan filter merge sort " * 8,
      "short", "", "exactly sixteen!",
      (0 until 500).map(i => ('a' + i % 7).toChar).mkString)
    for (t <- texts; mask <- Seq(8, 32)) {
      val got = kernelEnds(t, mask)
      assert(got == bruteEnds(t, mask), s"mask=$mask text=${t.take(30)}")
      if (t.nonEmpty) {
        assert(got.last == t.length)
        assert(got == got.sorted && got.distinct == got)
      } else assert(got.isEmpty)
    }
  }

  test("empty documents produce zero chunks, not a phantom null-hash chunk") {
    // CdcBoundaries returns [] for empty text; without the size guard,
    // zip_with pads starts=[0] against ends=[] into one (0, null) span
    // whose md5 is null — a chunk the oracle (no rows) refutes
    val docs = Seq((1L, "a corpus document long enough to chunk normally"),
      (2L, ""), (3L, "")).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text", 32)
    assert(chunks.filter($"id" =!= 1L).count() == 0)
    assert(chunks.filter($"h".isNull).count() == 0)
    // the incremental screen then simply omits empty docs
    val idx = Dedup.buildCdcIndex(docs, "doc_id", "text", 32)
    val m = Dedup.incrementalCdcMatches(docs, idx, "doc_id", "text", 32)
    assert(m.select("new_doc").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("content-defined cuts resynchronize after a prepended edit (the point of CDC)") {
    val body = "the training corpus contains many repeated passages that " +
      "deduplication must find even when documents shift by insertion " +
      "of new prefikses and headers onto otherwise identical content"
    val shifted = "EDIT-2026: " + body
    def chunks(t: String): Seq[String] = {
      val ends = kernelEnds(t, 32)
      (0 +: ends.init).zip(ends).map { case (s, e) => t.substring(s, e) }
    }
    val a = chunks(body).toSet
    val b = chunks(shifted).toSet
    // interior chunks re-align once the 16-char window clears the edit:
    // a majority of the original chunks survive verbatim in the shifted
    // doc, which is exactly what fixed-width chunking cannot give
    val common = a.intersect(b)
    assert(common.nonEmpty, s"a=$a b=$b")
    assert(common.size * 2 >= a.size, s"resync too weak: ${common.size}/${a.size}")
    // fixed-width 32-char chunking shares NOTHING after an 11-char shift
    def fixed(t: String) = t.grouped(32).toSet
    assert(fixed(body).intersect(fixed(shifted)).isEmpty)
  }
}
