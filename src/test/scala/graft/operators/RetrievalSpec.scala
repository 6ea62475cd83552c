package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def termsOf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("term"))

  private val corpus = Seq(
    0L -> "spark shuffle join",
    1L -> "spark shuffle join broadcast",
    2L -> "spark scan filter filter",
    3L -> "unrelated words entirely here",
    4L -> "join join join shuffle")

  test("bm25: save/load roundtrip serves the identical ranking") {
    val terms = termsOf(corpus)
    val idx = Retrieval.buildBm25Index(terms)
    val q = idx.postings.filter($"doc_id" < 1L)
      .select($"doc_id".as("q_id"), $"term")
    val direct = Retrieval.bm25Ranked(q, idx, 1.2, 0.75, 1L << 20)
      .collect().map(_.toSeq).toSet

    val path = tmpDir("bm25idx")
    Retrieval.saveBm25Index(idx, path)
    val loaded = Retrieval.loadBm25Index(spark, path)
    val q2 = loaded.postings.filter($"doc_id" < 1L)
      .select($"doc_id".as("q_id"), $"term")
    val served = Retrieval.bm25Ranked(q2, loaded, 1.2, 0.75, 1L << 20)
      .collect().map(_.toSeq).toSet
    assert(served == direct)
    // int64 state really is lossless: every artifact row survives
    assert(loaded.postings.collect().map(_.toSeq).toSet ==
      idx.postings.collect().map(_.toSeq).toSet)
    assert(loaded.stats.collect().map(_.toSeq).toSet ==
      idx.stats.collect().map(_.toSeq).toSet)
  }

  test("bm25: more shared terms outrank fewer, self excluded, topical idf") {
    val terms = termsOf(corpus)
    val idx = Retrieval.buildBm25Index(terms)
    val q = idx.postings.filter($"doc_id" === 0L)
      .select($"doc_id".as("q_id"), $"term")
    val ranked = Retrieval.bm25Ranked(q, idx, 1.2, 0.75, 1L << 20)
      .orderBy($"rank").collect()
    // doc 0 itself never appears
    assert(!ranked.exists(_.getAs[Long]("doc_id") == 0L))
    // doc 3 shares no terms with the query: no row at all
    assert(!ranked.exists(_.getAs[Long]("doc_id") == 3L))
    // doc 1 shares all three query terms — it must outrank doc 2 (one)
    val byDoc = ranked.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("rank")).toMap
    assert(byDoc(1L) < byDoc(2L), s"ranks: $byDoc")
  }

  test("bm25: scores are int64 and order-free (repartition invariant)") {
    val terms = termsOf(corpus)
    val idx = Retrieval.buildBm25Index(terms)
    val q = idx.postings.filter($"doc_id" < 2L)
      .select($"doc_id".as("q_id"), $"term")
    val a = Retrieval.bm25Ranked(q, idx, 1.2, 0.75, 1L << 20)
      .collect().map(_.toSeq).toSet
    val shuffledIdx = Bm25Index(idx.postings.repartition(7),
      idx.doclen.repartition(3), idx.docfreq.repartition(5), idx.stats)
    val b = Retrieval.bm25Ranked(q, shuffledIdx, 1.2, 0.75, 1L << 20)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
