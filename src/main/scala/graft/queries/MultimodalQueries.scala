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
  *
  * q53: REAL audio decode — genuine WAV payloads parsed by
  * `javax.sound.sampled`, verified sample-exactly against an arithmetic
  * oracle.
  *
  * q54: video frame-sampling plan — explode each video row into its
  * sampled frame timestamps (pure column math, no decode).
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

  // ── q53: REAL audio decode (javax.sound.sampled). Media are genuine
  // RIFF/WAVE payloads synthesized executor-side from a deterministic
  // sample formula (mono 8-bit unsigned PCM at 8 kHz); the engine parses
  // header + samples with the JDK's audio stack (PCM is lossless) and the
  // oracle recomputes frame count and amplitude sum arithmetically — so
  // sample_rate/channels/n_frames come from the DECODED header, proving
  // the decode actually ran.
  val q53_audio_decode: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d).select($"doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = (50 + id % 50).toInt
          val samples = Array.tabulate(n)(i => ((id * 17 + i * 29) % 256).toByte)
          org.apache.spark.sql.Row(id, "audio",
            Multimodal.encodeWav(8000, samples),
            org.apache.spark.sql.Row(0, 0, 0L, "wav"))
        }
      }(org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema))
    Multimodal.decodeAudios(media, batchSize = 64)
      .select($"media_id", $"sample_rate", $"channels", $"n_frames", $"amp_sum")
      .orderBy($"media_id")
  }
  val q53_sql: String =
    """SELECT d.doc_id AS media_id,
      |  8000 AS sample_rate,
      |  1 AS channels,
      |  CAST(50 + d.doc_id % 50 AS BIGINT) AS n_frames,
      |  CAST(sum((d.doc_id*17 + i.i*29) % 256) AS BIGINT) AS amp_sum
      |FROM documents d, range(100) i(i)
      |WHERE i.i < 50 + d.doc_id % 50
      |GROUP BY d.doc_id
      |ORDER BY media_id""".stripMargin

  // ── q54: video frame-sampling plan — every 700 ms in [0, duration).
  // The sampled timestamps are pure column math (sequence + explode, stays
  // in codegen; no payload decode), hash-verified against the oracle's
  // arithmetic range join.
  val q54_frame_sample: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d).select(
      $"doc_id".as("media_id"),
      lit("video").as("kind"),
      lit(Array.emptyByteArray).as("bytes"),
      struct(
        lit(0).as("width"), lit(0).as("height"),
        ($"doc_id" % 5000L + 1000L).as("duration_ms"),
        lit("fake").as("codec")).as("meta"))
    Multimodal.sampleFrames(media, everyMs = 700L)
      .select($"media_id", $"frame_ms")
      .orderBy($"media_id", $"frame_ms")
  }
  val q54_sql: String =
    """SELECT d.doc_id AS media_id, CAST(f.f AS BIGINT) AS frame_ms
      |FROM documents d, range(0, 6000, 700) f(f)
      |WHERE f.f < d.doc_id % 5000 + 1000
      |ORDER BY media_id, frame_ms""".stripMargin

  val queries: Map[String, Q] = Map(
    "q39_multimodal_features" -> q39_multimodal_features,
    "q51_image_decode" -> q51_image_decode,
    "q53_audio_decode" -> q53_audio_decode,
    "q54_frame_sample" -> q54_frame_sample)
  val oracleSql: Map[String, String] = Map(
    "q39_multimodal_features" -> q39_sql,
    "q51_image_decode" -> q51_sql,
    "q53_audio_decode" -> q53_sql,
    "q54_frame_sample" -> q54_sql)
}
