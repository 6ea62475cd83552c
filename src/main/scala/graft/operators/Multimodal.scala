package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import java.security.MessageDigest

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training pipelines.
  *
  * Model: media are OPAQUE binary columns plus a typed metadata struct —
  * `(media_id, kind, bytes: binary, meta: struct<width,height,duration_ms,
  * codec>)`. Decode / feature-extraction runs as a *batched* partition
  * transform: rows are processed in fixed-size batches inside
  * `mapPartitions` (the JVM analog of `mapInPandas` batch shape — a
  * native-codec decoder would hand each batch across JNI in one call).
  *
  * Two feature paths:
  *  - `decodeImages` — REAL image decode via `javax.imageio` (JDK-built-in,
  *    no external codec libs): PNG/JPEG/GIF/BMP payloads are decoded
  *    pixel-for-pixel into width/height/luminance statistics.
  *  - `decodeAudios` — REAL audio decode via `javax.sound.sampled`
  *    (JDK-built-in): WAV/PCM payloads parsed into sample-rate/channel/
  *    frame-count/amplitude statistics.
  *  - `extractFeatures` — codec-independent payload digests (byte length,
  *    content digest, prefix "thumbnail") for media kinds with no JDK
  *    decoder (video) or where decode is deferred.
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

  val decodedAudioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("sample_rate", IntegerType), // from the DECODED header
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("amp_sum", LongType),        // integer amplitude sum
    StructField("duration_ms", LongType)))   // n_frames * 1000 / sample_rate

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),   // from the DECODED raster, not meta
    StructField("height", IntegerType),
    StructField("luma_sum", LongType)))  // integer luminance sum over pixels

  // ImageIO's default stream cache spills through temp FILES per decode —
  // pure-memory streams keep executor-side decode off the local disks.
  ImageIO.setUseCache(false)

  /** Encode a grayscale PNG from a pixel function (test/data-synthesis
    * helper; PNG is lossless so `decodeImage` recovers the exact samples).
    * Runs executor-side — `ImageIO` is headless-safe. */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode (`javax.imageio`): returns (width, height, luma_sum)
    * from the decoded raster. Luminance is exact integer math so results
    * are bit-stable across JVMs: single-band images sum the raw samples;
    * multi-band images sum the Rec.601 integer luma
    * `(299*R + 587*G + 114*B) / 1000` per pixel. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload (no registered ImageIO reader)")
    val w = img.getWidth
    val h = img.getHeight
    var luma = 0L
    if (img.getRaster.getNumBands == 1) {
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { luma += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          luma += (299L * r + 587L * g + 114L * b) / 1000L
          x += 1
        }
        y += 1
      }
    }
    (w, h, luma)
  }

  /** Batched REAL image decode over a media frame: one decoded-stats row
    * per media row, via the same batch-shaped `mapPartitions` as
    * `extractFeatures`. Width/height come from the decoded raster (NOT the
    * metadata struct), so a corrupt or mislabeled payload surfaces as a
    * decode failure / dimension mismatch instead of silently passing
    * metadata through. */
  def decodeImages(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select("media_id", "kind", "bytes")
      .mapPartitions({ rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("bytes")
            val (w, h, luma) = decodeImage(bytes)
            Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
              bytes.length.toLong, w, h, luma)
          }
        }
      })(enc)
  }

  /** Encode a mono 8-bit unsigned PCM WAV through the JDK's real RIFF/WAVE
    * encoder (`javax.sound.sampled.AudioSystem`) — test/data-synthesis
    * helper; PCM is lossless so `decodeAudio` recovers the exact samples.
    * Each byte of `samples` is one unsigned 8-bit sample (0..255). */
  def encodeWav(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 16-bit signed little-endian PCM WAV encoder (interleave channels in
    * `samples` yourself; `channels` only sets the header's frame layout). */
  def encodeWav16(sampleRate: Int, samples: Array[Short], channels: Int = 1): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, channels, 2 * channels, sampleRate.toFloat, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, (samples.length / channels).toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode (`javax.sound.sampled`, JDK-built-in — parses the
    * RIFF/WAVE header and PCM payload, no external codec libs): returns
    * (sample_rate, channels, n_frames, amp_sum) from the DECODED stream,
    * not from caller metadata. `amp_sum` is exact integer math, bit-stable
    * across JVMs, honoring the header's sample width, signedness and
    * endianness. Non-PCM encodings (ULAW/ALAW) and payloads truncated
    * mid-frame fail loudly instead of producing wrong statistics. */
  def decodeAudio(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      // Fail loudly on anything that isn't plain PCM: a ULAW/ALAW payload
      // also reports 8 sample bits, but its bytes are companded codes —
      // summing them as amplitudes would return silently wrong statistics.
      require(signed || enc == AudioFormat.Encoding.PCM_UNSIGNED,
        s"unsupported audio encoding: $enc (PCM_SIGNED/PCM_UNSIGNED supported)")
      val bits = fmt.getSampleSizeInBits
      require(bits == 8 || bits == 16,
        s"unsupported PCM sample width: $bits bits (8/16 supported)")
      val data = ais.readAllBytes()
      // AudioInputStream only hands back whole frames, so a payload cut
      // mid-frame shows up as FEWER decoded frames than the header declared
      // — that's corruption, not a shorter clip
      val nFrames = data.length.toLong / fmt.getFrameSize
      val declared = ais.getFrameLength
      require(declared < 0 || nFrames == declared,
        s"truncated audio payload: decoded $nFrames of $declared declared frames")
      var sum = 0L
      if (bits == 8) {
        var i = 0
        if (signed) while (i < data.length) { sum += data(i); i += 1 }
        else while (i < data.length) { sum += data(i) & 0xff; i += 1 }
      } else {
        var i = 0
        while (i + 1 < data.length) {
          val s =
            if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
            else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
          sum += s
          i += 2
        }
      }
      (fmt.getSampleRate.toInt, fmt.getChannels, nFrames, sum)
    } finally ais.close()
  }

  /** Batched REAL audio decode over a media frame — the audio counterpart
    * of `decodeImages`, same batch-shaped `mapPartitions`. Sample rate,
    * channel count and frame count come from the decoded WAV header (NOT
    * the metadata struct), so a corrupt payload fails the decode instead of
    * passing metadata through. */
  def decodeAudios(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.row(decodedAudioSchema)
    media.select("media_id", "kind", "bytes")
      .mapPartitions({ rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("bytes")
            val (rate, chans, frames, ampSum) = decodeAudio(bytes)
            Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
              bytes.length.toLong, rate, chans, frames, ampSum,
              frames * 1000L / rate)
          }
        }
      })(enc)
  }

  /** Codec-independent payload digest "features": md5-derived 28-bit
    * content digest (mirrors TextFunctions.hash28 so a SQL oracle
    * replicates it), byte length, metadata-declared pixel count,
    * hex-of-prefix thumbnail. The decode-free path for opaque media. */
  def digestFeatures(bytes: Array[Byte]): (Long, String) = {
    val md5hex = MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    val brightness = java.lang.Long.parseLong(md5hex.take(7), 16)
    val thumb = bytes.take(8).map("%02x".format(_)).mkString
    (brightness, thumb)
  }

  /** Batched digest-feature extraction: runs once per BATCH of rows
    * (batch shape preserved for a native decoder), output is one feature
    * row per media row. For image payloads prefer `decodeImages`. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.select("media_id", "kind", "bytes", "meta.width", "meta.height")
      .mapPartitions({ rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // one call per batch — where a native decoder would take the
          // whole batch across JNI in a single hop
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("bytes")
            val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
            val (brightness, thumb) = digestFeatures(bytes)
            Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
              bytes.length.toLong, w.toLong * h, brightness, thumb)
          }
        }
      })(enc)
  }

  /** Metadata-level "resize": plan the target dimensions without touching
    * payloads (`resizeImages` is the payload-rewriting counterpart with the
    * same dimension math). Pure column math — stays in codegen. The
    * lower bound of 1 keeps extreme aspect ratios from planning a
    * zero-pixel side. */
  def planResize(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(w, h).cast(DoubleType))
    media.withColumn("resize_w",
        greatest(lit(1L), floor(w * scale)).cast(IntegerType))
      .withColumn("resize_h",
        greatest(lit(1L), floor(h * scale)).cast(IntegerType))
  }

  /** REAL single-image resize: decode, scale so the longer side is at most
    * `maxDim` (never upscales — payloads at or under the cap pass through
    * untouched), re-encode as PNG. Dimension math matches `planResize`
    * exactly. NEAREST_NEIGHBOUR interpolation: pure pixel selection, no
    * blended values, so results are bit-stable across JVMs (and a
    * solid-color image resizes to exactly that color). Band layout is
    * preserved (grayscale in → grayscale out). */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Array[Byte] = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload (no registered ImageIO reader)")
    val w = img.getWidth; val h = img.getHeight
    if (math.max(w, h) <= maxDim) return bytes
    val scale = maxDim.toDouble / math.max(w, h)
    val nw = math.max(1, math.floor(w * scale).toInt)
    val nh = math.max(1, math.floor(h * scale).toInt)
    val kind = if (img.getRaster.getNumBands == 1) BufferedImage.TYPE_BYTE_GRAY
               else BufferedImage.TYPE_INT_RGB
    val out = new BufferedImage(nw, nh, kind)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(img, 0, 0, nw, nh, null)
    } finally g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Batched REAL thumbnail generation over a media frame: each row's
    * payload is decoded, capped to `maxDim` and re-encoded (PNG) inside the
    * same batch-shaped `mapPartitions` as `decodeImages` — the
    * payload-rewriting counterpart of `planResize`. Output keeps the media
    * row identity plus the resized payload and its decoded dimensions. */
  def resizeImages(media: DataFrame, maxDim: Int, batchSize: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("bytes", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = Encoders.row(schema)
    media.select("media_id", "kind", "bytes")
      .mapPartitions({ rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val resized = resizeImage(r.getAs[Array[Byte]]("bytes"), maxDim)
            val (w, h, _) = decodeImage(resized)
            Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), resized, w, h)
          }
        }
      })(enc)
  }

  /** Frame sampling plan for video-kind media: every `everyMs` in
    * [0, duration); the row explodes into its sampled frame timestamps. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))))
}
