package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SparseSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val TNum = 6L
  private val TDen = 10L

  private def termsOf(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")

  /** Brute-force full-space tf-cosine pairs with the same int64
    * acceptance rule — no index, no pruning. */
  private def brute(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] = {
    val tfs = docs.map { case (id, text) =>
      id -> text.split(" ").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    }
    (for {
      (a, ta) <- tfs
      (b, tb) <- tfs if a < b
      num = ta.keySet.intersect(tb.keySet).toSeq.map(t => ta(t) * tb(t)).sum
      n2a = ta.values.map(v => v * v).sum
      n2b = tb.values.map(v => v * v).sum
      if num * num * TDen * TDen >= TNum * TNum * n2a * n2b && num > 0
    } yield (a, b, ta.keySet.intersect(tb.keySet).size.toLong, num)).toSet
  }

  private def joined(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] =
    SparseSimilarity.cosineJoinExact(termsOf(docs), TNum, TDen)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("num"))).toSet

  test("prefix-filtered join == brute force on a mixed corpus (no recall loss)") {
    // near-dups, partial overlaps through SHARED MEDIUM-DF terms (the q107
    // df-cap blind spot), disjoint docs, repeated tfs, a stopword that
    // appears everywhere
    val docs = Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown fox jumps over the lazy cat",
      2L -> "the quick brown fox leaps over the lazy dog",
      3L -> "entirely different content about spark engines the",
      4L -> "spark engines the entirely different content about",
      5L -> "the the the the the",
      6L -> "unrelated words only here",
      7L -> "the quick brown fox jumps over the lazy dog")
    assert(joined(docs) == brute(docs))
  }

  test("prefix-filtered join == brute force on a deterministic random corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "the", "of")
    val docs = (0L until 40L).map { id =>
      val len = 3 + rnd.nextInt(10)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assert(joined(docs) == brute(docs))
  }

  test("candidate count stays well below all-pairs on a stopword-heavy corpus") {
    // every doc shares two stopwords; distinctive terms are unique per
    // doc. All-pairs would generate n*(n-1)/2 candidates through the
    // stopwords alone; the prefix filter must not.
    val n = 80
    val docs = (0 until n).map { i =>
      i.toLong -> s"the of unique$i distinct$i special$i only$i token$i extra$i"
    }
    val tf = SparseSimilarity.tfVectors(termsOf(docs))
    val cands = SparseSimilarity.candidatePairs(tf, TNum, TDen).count()
    val allPairs = n.toLong * (n - 1) / 2
    assert(cands < allPairs / 4,
      s"prefix filter generated $cands candidates of $allPairs all-pairs")
    // and the filter is still exact: nothing here reaches the threshold
    assert(joined(docs) == brute(docs))
  }
}
