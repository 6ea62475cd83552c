package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * q25: brute-force exact cosine top-k (the correctness baseline).
  * q26: sign-bit LSH-bucketed approximate top-k (the 100 TB scale path —
  * the join shuffles on the bucket key, so a query scores only its own
  * bucket, never the whole corpus).
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  val Dim = 64
  val K = 5
  val MaxQueryId = 10L
  val LshBits = 6
  val LshMaxQueryId = 50L
  val LshK = 3

  val q25_knn_brute: Q = (s, d) => {
    import s.implicits._
    Similarity.knnExact(Tables.embeddings(s, d), "vec_id", "embedding",
        MaxQueryId, K)
      .orderBy($"q_id", $"rank")
  }
  lazy val q25_sql: String =
    s"""WITH sv AS (
       |  SELECT vec_id, ${sqlScaled("embedding")} AS v FROM embeddings
       |), scored AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
       |    ${sqlCosine("q.v", "e.v", Dim)} AS cos
       |  FROM sv q JOIN sv e ON q.vec_id < $MaxQueryId AND e.vec_id <> q.vec_id
       |)
       |SELECT q_id, rank, n_id, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, n_id ASC) AS rank FROM scored)
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin

  val q26_knn_lsh: Q = (s, d) => {
    import s.implicits._
    Similarity.knnLsh(Tables.embeddings(s, d), "vec_id", "embedding",
        LshMaxQueryId, LshBits, LshK)
      .orderBy($"q_id", $"rank")
  }
  lazy val q26_sql: String =
    s"""WITH sv AS (
       |  SELECT vec_id, ${sqlScaled("embedding")} AS v,
       |    ${sqlSignBucket("embedding", LshBits)} AS bucket
       |  FROM embeddings
       |), scored AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
       |    ${sqlCosine("q.v", "e.v", Dim)} AS cos
       |  FROM sv q JOIN sv e
       |    ON q.vec_id < $LshMaxQueryId AND e.bucket = q.bucket
       |   AND e.vec_id <> q.vec_id
       |)
       |SELECT q_id, rank, n_id, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, n_id ASC) AS rank FROM scored)
       |WHERE rank <= $LshK ORDER BY q_id, rank""".stripMargin

  // ── q40: embedding-cosine near-dup pairs (bucketed, thresholded) ────────
  val CosineDupThreshold = 0.4

  val q40_embedding_dedup: Q = (s, d) => {
    import s.implicits._
    Similarity.cosinePairs(Tables.embeddings(s, d), "vec_id", "embedding",
        LshBits, CosineDupThreshold)
      .orderBy($"vec_a", $"vec_b")
  }
  lazy val q40_sql: String =
    s"""WITH sv AS (
       |  SELECT vec_id, ${sqlScaled("embedding")} AS v,
       |    ${sqlSignBucket("embedding", LshBits)} AS bucket
       |  FROM embeddings
       |)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${sqlCosine("a.v", "b.v", Dim)} AS cos
       |FROM sv a JOIN sv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE ${sqlCosine("a.v", "b.v", Dim)} >= $CosineDupThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  val queries: Map[String, Q] = Map(
    "q25_knn_brute" -> q25_knn_brute,
    "q26_knn_lsh" -> q26_knn_lsh,
    "q40_embedding_dedup" -> q40_embedding_dedup,
  )
  val oracleSql: Map[String, String] = Map(
    "q25_knn_brute" -> q25_sql,
    "q26_knn_lsh" -> q26_sql,
    "q40_embedding_dedup" -> q40_sql,
  )
}
