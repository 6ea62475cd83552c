package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row

import graft.operators.Lifecycle._

/** Reflectively-instantiated CLI operator (needs a no-arg constructor). */
class LineLengthGatherer extends Gatherer[String, String] {
  override def counterNames: Seq[String] = Seq("lines")
  def gather(row: Row, emit: (String, String) => Unit, ctx: OperatorContext): Unit = {
    ctx.incrementCounter("lines")
    val line = row.getAs[String]("value")
    emit(line, line.length.toString)
  }
}

class ToolSpec extends SparkSpec {

  test("CLI verb: gather from text input to parquet output, with history") {
    val in = tmpDir("toolin")
    Files.write(Paths.get(in, "lines.txt"),
      "alpha\nbeta\n".getBytes(StandardCharsets.UTF_8))
    val out = tmpDir("toolout") + "/result"
    val hist = tmpDir("toolhist") + "/history"
    val r = Tool.run(spark, Array("gather",
      "--gatherer=graft.LineLengthGatherer",
      s"--input=format=text file=$in",
      s"--output=format=parquet file=$out",
      s"--history=$hist",
      "--name=cli-gather"))
    assert(r.status == "SUCCEEDED" && r.counters("lines") == 2L)
    val result = spark.read.parquet(out).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(result == Set(("alpha", "5"), ("beta", "4")))
    val h = spark.read.parquet(hist + "/jobs").collect()
    assert(h.length == 1 && h.head.getAs[String]("job_name") == "cli-gather")
  }

  test("CLI text output joins columns with tabs") {
    val in = tmpDir("toolin2")
    Files.write(Paths.get(in, "l.txt"), "xyz\n".getBytes(StandardCharsets.UTF_8))
    val out = tmpDir("toolout2") + "/txt"
    Tool.run(spark, Array("gather",
      "--gatherer=graft.LineLengthGatherer",
      s"--input=format=text file=$in",
      s"--output=format=text file=$out"))
    import scala.jdk.CollectionConverters._
    val lines = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala).toList
    assert(lines == List("xyz\t3"))
  }

  test("CLI avro output round-trips through the avro source") {
    val in = tmpDir("toolin3")
    Files.write(Paths.get(in, "l.txt"),
      "alpha\nbeta\n".getBytes(StandardCharsets.UTF_8))
    val out = tmpDir("toolout3") + "/avro"
    Tool.run(spark, Array("gather",
      "--gatherer=graft.LineLengthGatherer",
      s"--input=format=text file=$in",
      s"--output=format=avro file=$out"))
    val back = graft.sources.Formats.read(spark, s"format=avro file=$out")
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(back == Set(("alpha", "5"), ("beta", "4")))
  }

  test("CLI map output writes sorted MapFiles supporting point gets") {
    val in = tmpDir("toolin4")
    Files.write(Paths.get(in, "l.txt"),
      "zulu\nalpha\nmike\n".getBytes(StandardCharsets.UTF_8))
    val out = tmpDir("toolout4") + "/map"
    Tool.run(spark, Array("gather",
      "--gatherer=graft.LineLengthGatherer",
      s"--input=format=text file=$in",
      s"--output=format=map file=$out"))
    // index-backed point get (MapFileOutputFormat.getReaders read side)
    assert(graft.sources.Formats.mapFileGet(spark, out, "mike").contains("4"))
    assert(graft.sources.Formats.mapFileGet(spark, out, "nope").isEmpty)
    // data files are key-sorted (the MapFile contract)
    val keys = spark.sparkContext
      .sequenceFile(out + "/*/data",
        classOf[org.apache.hadoop.io.Text], classOf[org.apache.hadoop.io.Text])
      .map(_._1.toString).collect().toList
    assert(keys == keys.sorted)
  }

  test("CLI rejects unknown verbs and missing flags") {
    intercept[IllegalArgumentException](Tool.run(spark, Array("frobnicate")))
    intercept[IllegalArgumentException](Tool.run(spark, Array("gather", "--input=format=text file=/x")))
  }
}
