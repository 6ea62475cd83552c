package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal pipeline over media derived from `documents`.
  *
  * q39: opaque-payload digest features (byte length, md5-derived digest,
  * prefix thumbnail) — the decode-free path; the oracle replicates the
  * digest math exactly, hash-verifying the plumbing (binary encode,
  * metadata struct, batch mapPartitions, feature schema).
  *
  * q51: REAL image decode — genuine PNG payloads decoded by
  * `javax.imageio`, verified pixel-exactly against an arithmetic oracle.
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

  // ── q51: REAL image decode (javax.imageio). Media are genuine PNG
  // payloads synthesized executor-side from a deterministic pixel formula;
  // the engine decodes them pixel-for-pixel (PNG is lossless) and the
  // oracle recomputes the same width/height/luminance-sum arithmetically —
  // so the decoded output is hash-verified against ground truth, proving
  // the decode actually ran (width/height come from the decoded raster,
  // not the metadata).
  val q51_image_decode: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d).select($"doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (8 + id % 9).toInt
          val h = (8 + id % 7).toInt
          val bytes = Multimodal.encodePng(w, h,
            (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
          org.apache.spark.sql.Row(id, "image", bytes,
            org.apache.spark.sql.Row(w, h, 0L, "png"))
        }
      }(org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema))
    Multimodal.decodeImages(media, batchSize = 64)
      .select($"media_id", $"width", $"height", $"luma_sum")
      .orderBy($"media_id")
  }
  val q51_sql: String =
    """SELECT d.doc_id AS media_id,
      |  CAST(8 + d.doc_id % 9 AS INT) AS width,
      |  CAST(8 + d.doc_id % 7 AS INT) AS height,
      |  CAST(sum((d.doc_id*31 + gx.x*7 + gy.y*13) % 256) AS BIGINT) AS luma_sum
      |FROM documents d, range(16) gx(x), range(14) gy(y)
      |WHERE gx.x < 8 + d.doc_id % 9 AND gy.y < 8 + d.doc_id % 7
      |GROUP BY d.doc_id
      |ORDER BY media_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q39_multimodal_features" -> q39_multimodal_features,
    "q51_image_decode" -> q51_image_decode)
  val oracleSql: Map[String, String] = Map(
    "q39_multimodal_features" -> q39_sql,
    "q51_image_decode" -> q51_sql)
}
