package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"zorder_$tag").toString + "/t"

  test("mortonKey interleaves bits; quantize spans [0, 2^bits)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(ZOrder.mortonKey($"a", $"b", 4).as("z"))
    // a bits at even positions 2i, b bits at odd 2i+1: (1,0)->1, (0,1)->2,
    // (3,3)->15, and (a=101b, b=010b) -> 1·2^0 + 1·2^3 + 1·2^4 = 25
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 15L, 25L))
    val q = Seq(0L, 50L, 100L).toDF("v")
      .select(ZOrder.quantize($"v", lit(0L), lit(100L), 4).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(q == Seq(0L, 7L, 15L))
    // constant column maps to 0, not a division error
    val c = Seq(9L).toDF("v")
      .select(ZOrder.quantize($"v", lit(9L), lit(9L), 4).as("q"))
      .collect().head.getLong(0)
    assert(c == 0L)
  }

  test("writeZOrdered: lossless roundtrip; files cover BOTH dims compactly") {
    val n = 40000
    val rnd = new scala.util.Random(3)
    val df = (0 until n).map { i =>
      (i.toLong, rnd.nextInt(256).toLong, rnd.nextInt(256).toLong)
    }.toDF("id", "x", "y")
    val path = tmp("prune")
    ZOrder.writeZOrdered(df, path, "x", "y", bits = 8, numFiles = 16)
    val back = spark.read.parquet(path)
    // lossless: same rows, all columns intact
    assert(back.count() == n)
    assert(back.select(sum($"id"), sum($"x"), sum($"y")).collect().head ==
      df.select(sum($"id"), sum($"x"), sum($"y")).collect().head)
    // pruning shape: for each file, its (x, y) bounding box; a box query
    // on x∈[0,64) AND a box query on y∈[0,64) must each touch only a
    // minority of files — the whole point of interleaving both dims
    // (a single-key sort would cluster one dim and leave the other
    // spanning every file).
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 8, s"expected many files, got ${files.length}")
    val boxes = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min($"x"), max($"x"), min($"y"), max($"y")).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val touchX = boxes.count { case (x0, x1, _, _) => x0 < 64 && x1 >= 0 }
    val touchY = boxes.count { case (_, _, y0, y1) => y0 < 64 && y1 >= 0 }
    // threshold has sampling slack: repartitionByRange draws its range
    // bounds from a reservoir sample with a per-run seed, so a file
    // boundary can wobble across the queried box edge (observed 9/16
    // once in ~40 full-board runs at the exact-half threshold). The
    // discriminating failure this guards — a single-key sort leaving the
    // other dim unclustered — touches ALL 16 files, far past the slack.
    val cap = files.length * 5 / 8
    assert(touchX <= cap,
      s"x-box touches $touchX of ${files.length} files — x not clustered")
    assert(touchY <= cap,
      s"y-box touches $touchY of ${files.length} files — y not clustered")
  }
}
