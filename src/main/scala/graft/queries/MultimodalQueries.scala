package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal pipeline over fake media derived from `documents`: binary
  * payload + typed metadata → batched feature extraction (decode stub).
  * The oracle replicates the stub's md5-derived features exactly, so the
  * whole plumbing (binary encode, metadata struct, batch mapPartitions,
  * feature schema) is hash-verified.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val q39_multimodal_features: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d).select(
      $"doc_id".as("media_id"),
      lit("image").as("kind"),
      $"text".cast(BinaryType).as("bytes"),
      struct(
        ($"n_chars" % 64 + 1).cast(IntegerType).as("width"),
        ($"n_chars" % 48 + 1).cast(IntegerType).as("height"),
        lit(0L).as("duration_ms"),
        lit("fake").as("codec")).as("meta"))
    Multimodal.extractFeatures(media, batchSize = 64)
      .select($"media_id", $"n_bytes", $"n_pixels", $"brightness", $"thumb")
      .orderBy($"media_id")
  }
  val q39_sql: String =
    """SELECT doc_id AS media_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  (n_chars % 64 + 1) * (n_chars % 48 + 1) AS n_pixels,
      |  ('0x'||substr(md5(text),1,7))::BIGINT AS brightness,
      |  lower(hex(encode(substr(text, 1, 8)))) AS thumb
      |FROM documents ORDER BY media_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q39_multimodal_features" -> q39_multimodal_features)
  val oracleSql: Map[String, String] = Map(
    "q39_multimodal_features" -> q39_sql)
}
