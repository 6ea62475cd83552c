package graft.sinks

import java.nio.file.Paths

import graft.SparkSpec
import graft.sources.Formats

class DirectSinkSpec extends SparkSpec {
  import spark.implicits._

  test("direct append + read-time resolution + compact restores order") {
    val path = Paths.get(tmpDir("direct"), "t").toString
    val base = Seq((1L, "info", "email", 10L, "old@x"))
      .toDF("entity_id", "family", "qualifier", "ts", "value")
    DirectSink.append(base, path)
    DirectSink.append(Seq((1L, "info", "email", 20L, "new@x"))
      .toDF("entity_id", "family", "qualifier", "ts", "value"), path)
    // readers see the union; newest-ts resolution at read time
    val t = new graft.table.EntityTable(spark, path,
      graft.table.TableLayout("t", Seq(graft.table.FamilySpec("info"))))
    assert(t.mostRecent().select("value").as[String].head() == "new@x")
    DirectSink.compact(spark, path, numPartitions = 1)
    assert(t.cells.count() == 2) // compaction preserves all versions
    assert(t.mostRecent().select("value").as[String].head() == "new@x")
  }

  test("avrokv format: key/value fields surface as two columns") {
    val dir = tmpDir("avrokv") + "/out"
    Formats.writeAvro(Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value"), dir,
      """{"type":"record","name":"KV","fields":[
        |{"name":"key","type":"string"},{"name":"value","type":"string"}]}""".stripMargin)
    val back = Formats.read(spark, s"format=avrokv file=$dir")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(("k1", "v1"), ("k2", "v2")))
  }
}
