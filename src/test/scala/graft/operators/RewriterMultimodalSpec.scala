package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class RewriterMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("cell rewriter: rule chain applies to fixpoint (int -> long -> string)") {
    val cells = Seq((1L, 42), (2L, 7)).toDF("entity_id", "value")
    val rules = Seq(
      CellRewriter.Rule(IntegerType, LongType, _.cast(LongType) * 2),
      CellRewriter.Rule(LongType, StringType, c => concat(lit("v"), c)))
    val out = CellRewriter.rewrite(cells, "value", rules)
    assert(out.schema("value").dataType == StringType)
    assert(out.select("value").as[String].collect().toSet == Set("v84", "v14"))
  }

  test("cell rewriter: no matching rule is a pass-through") {
    val cells = Seq((1L, 1.5)).toDF("entity_id", "value")
    val out = CellRewriter.rewrite(cells, "value",
      Seq(CellRewriter.Rule(IntegerType, LongType, _.cast(LongType))))
    assert(out.schema("value").dataType == DoubleType)
    assert(out.select("value").as[Double].head() == 1.5)
  }

  test("cell rewriter: rule cycles are rejected") {
    intercept[IllegalArgumentException] {
      CellRewriter.resolveChain(IntegerType, Seq(
        CellRewriter.Rule(IntegerType, LongType, _.cast(LongType)),
        CellRewriter.Rule(LongType, IntegerType, _.cast(IntegerType))))
    }
  }

  test("record rewriter: chained v1→v2→v3 migration converges per generation") {
    val nullS = lit(null).cast(StringType)
    val nullL = lit(null).cast(LongType)
    // superset struct {old_name, name, score}; v1 wrote old_name, v2 renamed
    // to name, v3 added score = length(name)
    val cells = Seq((1, "ada"), (2, "grace"), (3, "alan")).toDF("v", "raw")
      .select($"v",
        when($"v" === 1, struct($"raw".as("old_name"), nullS.as("name"), nullL.as("score")))
        .when($"v" === 2, struct(nullS.as("old_name"), $"raw".as("name"), nullL.as("score")))
        .otherwise(struct(nullS.as("old_name"), $"raw".as("name"),
          length($"raw").cast(LongType).as("score"))).as("value"))
    val rules = Seq(
      CellRewriter.RecordRule(1, 2, c =>
        c.withField("name", c.getField("old_name")).withField("old_name", nullS)),
      CellRewriter.RecordRule(2, 3, c =>
        c.withField("score", length(c.getField("name")).cast(LongType))))
    val out = CellRewriter.rewriteRecords(cells, "v", "value", rules)
      .select($"v", $"value.name", $"value.score", $"value.old_name")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.toSet == Set((3, "ada", 3L, null), (3, "grace", 5L, null),
      (3, "alan", 4L, null)))
  }

  test("record rewriter: versions without rules pass through; cycles throw") {
    val cells = Seq((9, "x")).toDF("v", "raw")
      .select($"v", struct($"raw".as("name")).as("value"))
    val rules = Seq(CellRewriter.RecordRule(1, 2, identity))
    val out = CellRewriter.rewriteRecords(cells, "v", "value", rules).collect()
    assert(out.head.getInt(0) == 9)
    intercept[IllegalArgumentException] {
      CellRewriter.resolveRecordChain(1, Seq(
        CellRewriter.RecordRule(1, 2, identity),
        CellRewriter.RecordRule(2, 1, identity)))
    }
  }

  private def media = Seq(
    (1L, "image", "hello world".getBytes("UTF-8"), 640, 480, 0L),
    (2L, "video", "clip-bytes".getBytes("UTF-8"), 1920, 1080, 2500L)
  ).toDF("media_id", "kind", "bytes", "w", "h", "dur")
    .select($"media_id", $"kind", $"bytes",
      struct($"w".as("width"), $"h".as("height"),
        $"dur".as("duration_ms"), lit("fake").as("codec")).as("meta"))

  test("multimodal: batched feature extraction is deterministic and exact") {
    val f = Multimodal.extractFeatures(media, batchSize = 1).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(f(1L).getAs[Long]("n_bytes") == 11L)
    assert(f(1L).getAs[Long]("n_pixels") == 640L * 480L)
    // brightness = first 7 hex digits of md5("hello world") = 5eb63bb
    assert(f(1L).getAs[Long]("brightness") == java.lang.Long.parseLong("5eb63bb", 16))
    assert(f(1L).getAs[String]("thumb") == "68656c6c6f20776f") // "hello wo"
    // batch size must not change results
    val f64 = Multimodal.extractFeatures(media, batchSize = 64).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("brightness")).toMap
    assert(f64(1L) == f(1L).getAs[Long]("brightness"))
  }

  test("multimodal: real PNG decode round-trips exact pixels (javax.imageio)") {
    // local encode/decode: lossless round-trip of a known gradient
    val bytes = Multimodal.encodePng(5, 3, (x, y) => x * 40 + y * 10)
    val (w, h, luma) = Multimodal.decodeImage(bytes)
    assert((w, h) == ((5, 3)))
    val expected = (for { y <- 0 until 3; x <- 0 until 5 } yield (x * 40 + y * 10) & 0xff).sum
    assert(luma == expected.toLong)
    // sample values >= 256 wrap through & 0xff on encode
    val wrapped = Multimodal.encodePng(2, 1, (x, _) => 300 + x)
    assert(Multimodal.decodeImage(wrapped)._3 == ((300 & 0xff) + (301 & 0xff)).toLong)
    // distributed batched decode: width/height come from the decoded
    // raster, luma matches the formula, batch size is irrelevant
    val pngMedia = spark.range(0, 20).select($"id".as("media_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val wd = (3 + id % 4).toInt; val ht = (2 + id % 3).toInt
          val b = Multimodal.encodePng(wd, ht, (x, y) => ((id * 17 + x * 5 + y * 11) % 256).toInt)
          org.apache.spark.sql.Row(id, "image", b,
            org.apache.spark.sql.Row(wd, ht, 0L, "png"))
        }
      }(org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema))
    def check(batchSize: Int): Unit = {
      val rows = Multimodal.decodeImages(pngMedia, batchSize).collect()
      assert(rows.length == 20)
      rows.foreach { r =>
        val id = r.getAs[Long]("media_id")
        val wd = (3 + id % 4).toInt; val ht = (2 + id % 3).toInt
        assert(r.getAs[Int]("width") == wd)
        assert(r.getAs[Int]("height") == ht)
        val exp = (for { y <- 0 until ht; x <- 0 until wd }
          yield (id * 17 + x * 5 + y * 11) % 256).sum
        assert(r.getAs[Long]("luma_sum") == exp)
        assert(r.getAs[Long]("n_bytes") > 0L)
      }
    }
    check(batchSize = 1); check(batchSize = 64)
    // a non-image payload fails loudly, not silently
    intercept[Exception] { Multimodal.decodeImage("not a png".getBytes("UTF-8")) }
  }

  test("multimodal: real image resize caps the long side, preserves content") {
    // solid-gray 40x20 capped at 10 → 10x5, and NEAREST_NEIGHBOUR keeps
    // every pixel exactly the source color
    val bytes = Multimodal.encodePng(40, 20, (_, _) => 77)
    val resized = Multimodal.resizeImage(bytes, 10)
    val (w, h, luma) = Multimodal.decodeImage(resized)
    assert((w, h) == ((10, 5)))
    assert(luma == 10L * 5 * 77)
    // at-or-under-cap payloads pass through untouched (no upscale, no
    // re-encode)
    assert(Multimodal.resizeImage(bytes, 40) eq bytes)
    // extreme aspect ratios floor to 1, never 0
    val tall = Multimodal.encodePng(1, 100, (_, _) => 5)
    val (tw, th, _) = Multimodal.decodeImage(Multimodal.resizeImage(tall, 10))
    assert((tw, th) == ((1, 10)))
    // distributed: resized payload dims agree with planResize's column math
    val pngMedia = spark.range(0, 12).select($"id".as("media_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val wd = (3 + id % 5).toInt; val ht = (2 + id % 4).toInt
          val b = Multimodal.encodePng(wd, ht, (x, y) => ((id + x + y) % 256).toInt)
          org.apache.spark.sql.Row(id, "image", b,
            org.apache.spark.sql.Row(wd, ht, 0L, "png"))
        }
      }(org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema))
    val planned = Multimodal.planResize(pngMedia, 4)
      .select($"media_id", $"resize_w", $"resize_h").collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("resize_w"), r.getAs[Int]("resize_h")))).toMap
    Multimodal.resizeImages(pngMedia, 4, batchSize = 5).collect().foreach { r =>
      val got = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(got == planned(r.getAs[Long]("media_id")),
        s"media ${r.getAs[Long]("media_id")}: resized $got != planned")
      assert(math.max(got._1, got._2) <= 4)
    }
  }

  test("multimodal: resize plan caps the max dimension, keeps aspect") {
    val out = Multimodal.planResize(media, 100).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("resize_w"), r.getAs[Int]("resize_h")))).toMap
    assert(out(1L) == ((100, 75)))   // 640x480 -> 100x75
    assert(out(2L) == ((100, 56)))   // 1920x1080 -> 100x56 (floor)
  }

  test("multimodal: real WAV decode round-trips exact samples (javax.sound)") {
    // 8-bit unsigned mono: lossless round-trip of a known ramp
    val samples = Array.tabulate(100)(i => (i * 3 % 256).toByte)
    val wav = Multimodal.encodeWav(8000, samples)
    val (rate, chans, frames, sum) = Multimodal.decodeAudio(wav)
    assert((rate, chans, frames) == ((8000, 1, 100L)))
    assert(sum == samples.map(_ & 0xff).map(_.toLong).sum)
    // 16-bit signed (incl. negative samples) honors signedness
    val s16 = Array[Short](-32768, -1, 0, 1, 32767, 1000)
    val (r16, c16, f16, sum16) = Multimodal.decodeAudio(Multimodal.encodeWav16(44100, s16))
    assert((r16, c16, f16) == ((44100, 1, 6L)))
    assert(sum16 == s16.map(_.toLong).sum)
    // stereo: frame count is per-frame, amplitude sums all channels
    val st = Array[Short](10, -10, 20, -20)
    val (_, cSt, fSt, sumSt) = Multimodal.decodeAudio(Multimodal.encodeWav16(8000, st, channels = 2))
    assert((cSt, fSt, sumSt) == ((2, 2L, 0L)))
    // a non-audio payload fails loudly, not silently
    intercept[Exception] { Multimodal.decodeAudio("not a wav".getBytes("UTF-8")) }
    // non-PCM encodings fail loudly: ULAW bytes are companded codes, and
    // summing them as PCM amplitudes would be silently wrong
    locally {
      import javax.sound.sampled._
      val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
      val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(Array.fill[Byte](40)(7)), pcm, 20L)
      val ulaw = AudioSystem.getAudioInputStream(ulawFmt, src)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ulaw, AudioFileFormat.Type.WAVE, bos)
      val e = intercept[IllegalArgumentException] { Multimodal.decodeAudio(bos.toByteArray) }
      assert(e.getMessage.contains("unsupported audio encoding"))
    }
    // a payload truncated mid-frame is corrupt, not a shorter clip
    locally {
      val whole = Multimodal.encodeWav16(8000, Array[Short](100, -100, 300))
      val e = intercept[IllegalArgumentException] {
        Multimodal.decodeAudio(whole.dropRight(1))
      }
      assert(e.getMessage.contains("truncated audio payload"))
    }
    // signed 8-bit PCM sums SIGNED samples (not & 0xff). WAV stores 8-bit
    // unsigned, so exercise the signed branch through AIFF (8-bit signed).
    locally {
      import javax.sound.sampled._
      val fmt8 = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 8, 1, 1, 8000f, true)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(Array[Byte](1, -2, 3)), fmt8, 3L)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
      val (_, _, f8, s8) = Multimodal.decodeAudio(bos.toByteArray)
      assert((f8, s8) == ((3L, 2L))) // 1 + (-2) + 3
    }
    // distributed batched decode: header stats come from the DECODED wav,
    // batch size is irrelevant
    val wavMedia = spark.range(0, 20).select($"id".as("media_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = (10 + id % 5).toInt
          val b = Multimodal.encodeWav(16000,
            Array.tabulate(n)(i => ((id * 7 + i * 11) % 256).toByte))
          org.apache.spark.sql.Row(id, "audio", b,
            org.apache.spark.sql.Row(0, 0, 0L, "wav"))
        }
      }(org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema))
    def check(batchSize: Int): Unit = {
      val rows = Multimodal.decodeAudios(wavMedia, batchSize).collect()
      assert(rows.length == 20)
      rows.foreach { r =>
        val id = r.getAs[Long]("media_id")
        val n = (10 + id % 5).toInt
        assert(r.getAs[Int]("sample_rate") == 16000)
        assert(r.getAs[Int]("channels") == 1)
        assert(r.getAs[Long]("n_frames") == n.toLong)
        assert(r.getAs[Long]("duration_ms") == n.toLong * 1000 / 16000)
        val exp = (0 until n).map(i => (id * 7 + i * 11) % 256).sum
        assert(r.getAs[Long]("amp_sum") == exp)
      }
    }
    check(batchSize = 1); check(batchSize = 64)
  }

  test("multimodal: frame sampling explodes video rows only") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
      .select("media_id", "frame_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.toSet == Set((2L, 0L), (2L, 1000L), (2L, 2000L)))
  }
}
