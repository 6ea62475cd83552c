package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an `array<float>` embedding column.
  *
  * Two strategies with the same output contract (query id, neighbor id,
  * rank, cosine):
  *
  *  - '''knnExact''' — brute-force: broadcast the (small) query set against
  *    the full corpus, exact cosine, per-query top-k window. The right
  *    baseline whenever |queries| is small: one corpus scan, no shuffle of
  *    the corpus, and the window runs over |queries|·k-bounded partitions.
  *  - '''knnLsh''' — sign-bit LSH: corpus and queries are both keyed by a
  *    b-bit sign bucket; the join shuffles on the bucket key so a query only
  *    scores vectors in its own bucket. This is the 100 TB shape: bucket
  *    cardinality 2^b bounds the join fan-out, and the exact cosine rerank
  *    touches only co-bucketed candidates.
  *
  * Cosine is computed on 2^20-scaled int64 vectors (exact integer dot/norm,
  * one final double division) so ranks are bit-identical across engines —
  * see [[graft.functions.VectorFunctions]].
  */
object Similarity {

  /** Brute-force exact top-k cosine neighbors for queries `idCol < maxQueryId`. */
  def knnExact(emb: DataFrame, idCol: String, vecCol: String,
               maxQueryId: Long, k: Int): DataFrame = {
    val scaledEmb = emb.select(col(idCol).as("n_id"), scaled(col(vecCol)).as("nv"))
    val queries = emb.filter(col(idCol) < maxQueryId)
      .select(col(idCol).as("q_id"), scaled(col(vecCol)).as("qv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    scaledEmb.join(broadcast(queries), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), cosineScaled(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs: sign-bucket LSH self-join, so
    * candidate generation is Σ bucket² (never all-pairs), then the exact
    * scaled-int cosine threshold. The vector-space analog of the MinHash
    * text dedup: output (vec_a, vec_b, cos) for same-bucket pairs with
    * cos >= threshold. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  bits: Int, threshold: Double): DataFrame = {
    val bucketed = emb.select(col(idCol).as("id"), scaled(col(vecCol)).as("sv"),
      signBucket(col(vecCol), bits).as("bucket"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        cosineScaled(col("a.sv"), col("b.sv")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** LSH-bucketed approximate top-k: only same-bucket candidates scored. */
  def knnLsh(emb: DataFrame, idCol: String, vecCol: String,
             maxQueryId: Long, bits: Int, k: Int): DataFrame = {
    val bucketed = emb.select(col(idCol).as("n_id"), scaled(col(vecCol)).as("nv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val queries = emb.filter(col(idCol) < maxQueryId)
      .select(col(idCol).as("q_id"), scaled(col(vecCol)).as("qv"),
        signBucket(col(vecCol), bits).as("qbucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    bucketed.join(broadcast(queries),
        col("bucket") === col("qbucket") && col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), cosineScaled(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }
}
