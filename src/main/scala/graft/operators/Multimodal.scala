package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training pipelines.
  *
  * Model: media are OPAQUE binary columns plus a typed metadata struct —
  * `(media_id, kind, bytes: binary, meta: struct<width,height,duration_ms,
  * codec>)`. Decode / feature-extraction runs as a *batched* partition
  * transform: rows are processed in fixed-size batches inside
  * `mapPartitions` (the JVM analog of `mapInPandas` batch shape — a real
  * decoder would hand each batch to native code in one call).
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * environment): `decodeStub` derives deterministic pseudo-features from
  * the bytes (md5-based) and the metadata. Everything around it — schema,
  * batching, partitioning, feature output shape — is the real plumbing a
  * production decoder would drop into.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("n_pixels", LongType),
    StructField("brightness", LongType), // 28-bit digest of the payload
    StructField("thumb", StringType)))   // first-8-bytes hex "thumbnail"

  /** ======= STUB: replace with a real decoder (libjpeg/ffmpeg/...). =======
    * Deterministic fake decode: md5-derived 28-bit "brightness", byte
    * length, metadata-declared pixel count, hex-of-prefix "thumbnail".
    * Mirrors TextFunctions.hash28 so a SQL oracle can replicate it. */
  def decodeStub(bytes: Array[Byte], width: Int, height: Int): (Long, String) = {
    val md5hex = MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    val brightness = java.lang.Long.parseLong(md5hex.take(7), 16)
    val thumb = bytes.take(8).map("%02x".format(_)).mkString
    (brightness, thumb)
  }

  /** Batched feature extraction: the decode runs once per BATCH of rows
    * (batch shape preserved for a native decoder), output is one feature
    * row per media row. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.select("media_id", "kind", "bytes", "meta.width", "meta.height")
      .mapPartitions({ rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // one call per batch — where a real decoder would take the
          // whole batch across JNI in a single hop
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("bytes")
            val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
            val (brightness, thumb) = decodeStub(bytes, w, h)
            Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
              bytes.length.toLong, w.toLong * h, brightness, thumb)
          }
        }
      })(enc)
  }

  /** Metadata-level "resize": plan the target dimensions without touching
    * payloads (a real resize would rewrite bytes in the same batched
    * shape). Pure column math — stays in codegen. */
  def planResize(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(w, h).cast(DoubleType))
    media.withColumn("resize_w", floor(w * scale).cast(IntegerType))
      .withColumn("resize_h", floor(h * scale).cast(IntegerType))
  }

  /** Frame sampling plan for video-kind media: every `everyMs` in
    * [0, duration); the row explodes into its sampled frame timestamps. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))))
}
