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

  test("multimodal: resize plan caps the max dimension, keeps aspect") {
    val out = Multimodal.planResize(media, 100).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("resize_w"), r.getAs[Int]("resize_h")))).toMap
    assert(out(1L) == ((100, 75)))   // 640x480 -> 100x75
    assert(out(2L) == ((100, 56)))   // 1920x1080 -> 100x56 (floor)
  }

  test("multimodal: frame sampling explodes video rows only") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
      .select("media_id", "frame_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.toSet == Set((2L, 0L), (2L, 1000L), (2L, 2000L)))
  }
}
