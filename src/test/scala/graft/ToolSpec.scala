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
    val h = spark.read.parquet(hist).collect()
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

  test("CLI rejects unknown verbs and missing flags") {
    intercept[IllegalArgumentException](Tool.run(spark, Array("frobnicate")))
    intercept[IllegalArgumentException](Tool.run(spark, Array("gather", "--input=format=text file=/x")))
  }
}
