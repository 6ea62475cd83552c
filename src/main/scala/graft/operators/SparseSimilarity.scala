package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** EXACT all-pairs cosine over sparse tf vectors, full term space, with
  * Bayardo-style prefix filtering (Bayardo, Ma, Srikant: "Scaling Up All
  * Pairs Similarity Search", WWW 2007) to bound candidate generation.
  *
  * The df-capped variant (q107, `LexicalQueries`) is exact over a REDUCED
  * similarity space: terms with df > cap are deleted from the vectors
  * themselves, so two documents similar only through medium-df terms above
  * the cap are invisible. This operator removes that recall loss: the
  * SIMILARITY is computed over every term; only the candidate INDEX is
  * pruned, with a bound that provably cannot drop a qualifying pair.
  *
  * The filter, in Bayardo's remaining-mass form made integer-exact: order
  * each document's terms by global frequency (df DESC, term ASC — the
  * candidate-generating stopwords FIRST), leave the head unindexed while
  * its accumulated mass alone could not reach the threshold, and index
  * rank r onward:
  *
  *     index rank r  ⟺  cum_y(r) · tDen² ≥ tNum² · n2_y
  *
  * where n2 = Σ tf², cum(r) = running Σ tf² through rank r, and the
  * threshold is the rational t = tNum/tDen. The unindexed head mass is
  * then H_y < t² · n2_y. If a qualifying pair (cos ≥ t) shared no indexed
  * term of y, every shared term would sit in y's unindexed head, so by
  * Cauchy-Schwarz num² ≤ n2_x · H_y < t² · n2_x · n2_y — i.e. cos < t,
  * contradiction. (The safety argument is order-free — any split whose
  * unindexed mass is < t²·n2 is exact; putting the HIGH-df terms in the
  * unindexed head is what makes the index cheap, since those are exactly
  * the terms whose posting lists generate quadratic candidates.)
  * Probing is therefore one-sided-complete: FULL vector x joined against
  * y's partial index finds every qualifying pair; generating both ordered
  * directions and deduplicating makes it symmetric. All comparisons are
  * int64 (tf, df, masses, the final num²·tDen² ≥ tNum²·n2a·n2b
  * acceptance), so a SQL oracle replays candidate generation AND
  * verification bit-for-bit; the reported cosine is one double division
  * computed identically in both engines.
  *
  * Scale shape (100 TB): the index join on `term` is the inverted-index
  * access path — high-df terms (stopwords, boilerplate) rank LAST inside
  * every document, fall outside the index cut for all but trivially short
  * documents, and so have near-zero indexed postings: candidates per term
  * ≈ df_full × df_indexed with df_indexed ≪ df_full exactly where df_full
  * explodes. Verification touches candidate pairs only. Windows partition
  * by doc_id (widest partition = longest document); aggregations are
  * partial-agg shuffles on (doc, term) / term / pair keys. int64 headroom:
  * num ≤ n2 ≤ (doc len)·max_tf² — num²·tDen² stays under 2^63 while
  * n2 < 2^30·tDen⁻¹, i.e. per-document token mass up to ~10⁸ at tDen=10;
  * cap document length upstream (q63's truncation) past that.
  */
object SparseSimilarity {

  /** Per-document tf vectors `(doc_id, term, tf)` from a (doc_id, term)
    * token stream. */
  def tfVectors(terms: DataFrame): DataFrame =
    terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** The indexed (tail) postings: tf rows in global df-DESC order, kept
    * from the first rank whose accumulated mass could reach the
    * threshold — the high-df head stays unindexed. Columns:
    * (doc_id, term, tf). */
  def prefixIndex(tf: DataFrame, tNum: Long, tDen: Long): DataFrame = {
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").desc, col("term").asc)
    val wCum = wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tf.join(df, "term")
      .withColumn("cum", sum(col("tf") * col("tf")).over(wCum))
      .withColumn("n2", sum(col("tf") * col("tf"))
        .over(Window.partitionBy(col("doc_id"))))
      .filter(col("cum") * lit(tDen * tDen) >= lit(tNum * tNum) * col("n2"))
      .select(col("doc_id"), col("term"), col("tf"))
  }

  /** Distinct unordered candidate pairs `(doc_a < doc_b)` — full vectors
    * probed against the partial index, both directions, deduplicated.
    * Public so tests can assert |candidates| ≪ all-pairs. */
  def candidatePairs(tf: DataFrame, tNum: Long, tDen: Long): DataFrame = {
    val idx = prefixIndex(tf, tNum, tDen)
    tf.select(col("doc_id").as("p_doc"), col("term"))
      .join(idx.select(col("doc_id").as("i_doc"), col("term")), "term")
      .filter(col("p_doc") =!= col("i_doc"))
      .select(least(col("p_doc"), col("i_doc")).as("doc_a"),
        greatest(col("p_doc"), col("i_doc")).as("doc_b"))
      .distinct()
  }

  /** The exact join: all pairs with full-space tf-cosine ≥ tNum/tDen.
    * Output (doc_a, doc_b, n_shared, num, cos) — `num` the exact int64
    * dot product, `n_shared` the shared-term count, `cos` the one-division
    * double. */
  def cosineJoinExact(terms: DataFrame, tNum: Long, tDen: Long): DataFrame = {
    // The tf table feeds the df agg, the index, the probe, and the
    // verification joins — persist one copy instead of recomputing the
    // (doc, term) aggregation per reference (released by the caller via
    // OperatorCaches, the LSH-signature convention).
    val tf = OperatorCaches.register(tfVectors(terms).persist())
    val norms = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val cand = candidatePairs(tf, tNum, tDen)
    val dots = cand
      .join(tf.select(col("doc_id").as("doc_a"), col("term"),
        col("tf").as("tfa")), "doc_a")
      .join(tf.select(col("doc_id").as("doc_b"), col("term"),
        col("tf").as("tfb")), Seq("doc_b", "term"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("tfa") * col("tfb")).as("num"),
        count(lit(1)).as("n_shared"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("n2a")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("n2b")), "doc_b")
      // integer acceptance: cos >= t  <=>  num² · tDen² >= tNum² · n2a · n2b
      .filter(col("num") * col("num") * lit(tDen * tDen)
        >= lit(tNum * tNum) * col("n2a") * col("n2b"))
      .withColumn("cos", col("num").cast(DoubleType) /
        (sqrt(col("n2a").cast(DoubleType)) * sqrt(col("n2b").cast(DoubleType))))
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("num"), col("cos"))
  }
}
