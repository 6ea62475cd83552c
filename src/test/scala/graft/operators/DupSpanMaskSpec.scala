package graft.operators

import graft.SparkSpec

class DupSpanMaskSpec extends SparkSpec {
  import spark.implicits._

  private val N = 4 // span width for the tests (query uses 8)

  private def mask(docs: Seq[(Long, String)]) =
    Dedup.dupSpanMask(docs.toDF("doc_id", "text"), "doc_id", "text", N)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_covered"),
          r.getAs[String]("kept_text")))).toMap

  test("a shared n-gram masks exactly its span, unique prose survives") {
    // docs 1 and 2 share the 4-token run "the quick brown fox"; the rest
    // of each doc is unique → exactly 4 positions masked in each
    val out = mask(Seq(
      1L -> "alpha beta the quick brown fox gamma delta",
      2L -> "the quick brown fox zeta eta theta iota kappa"))
    assert(out(1L) == ((8L, 4L, "alpha beta gamma delta")))
    assert(out(2L) == ((9L, 4L, "zeta eta theta iota kappa")))
  }

  test("overlapping duplicated grams mask the union of their spans") {
    // a 5-token shared run contains two overlapping 4-grams → 5 positions
    val out = mask(Seq(
      1L -> "one two three four five unique1 unique2",
      2L -> "one two three four five other1 other2"))
    assert(out(1L) == ((7L, 5L, "unique1 unique2")))
    assert(out(2L) == ((7L, 5L, "other1 other2")))
  }

  test("identical documents are fully masked (kept_text empty)") {
    val out = mask(Seq(
      1L -> "same words in both documents here",
      2L -> "same words in both documents here"))
    assert(out(1L) == ((6L, 6L, "")))
    assert(out(2L) == ((6L, 6L, "")))
  }

  test("documents shorter than the span width are never masked") {
    val out = mask(Seq(
      1L -> "tiny doc one",
      2L -> "tiny doc one")) // identical, but only 3 < N tokens
    assert(out(1L) == ((3L, 0L, "tiny doc one")))
    assert(out(2L) == ((3L, 0L, "tiny doc one")))
  }

  test("within-document repetition alone does not mask (df is per-doc)") {
    // the gram repeats INSIDE doc 1 but appears in no other doc
    val out = mask(Seq(
      1L -> "a b c d x a b c d",
      2L -> "totally different words here now"))
    assert(out(1L)._2 == 0L)
    assert(out(2L)._2 == 0L)
  }

  test("three-way shared passage masks in every member") {
    val out = mask(Seq(
      1L -> "p q r s doc1end",
      2L -> "doc2start p q r s",
      3L -> "x p q r s y"))
    assert(out(1L) == ((5L, 4L, "doc1end")))
    assert(out(2L) == ((5L, 4L, "doc2start")))
    assert(out(3L) == ((6L, 4L, "x y")))
  }
}
