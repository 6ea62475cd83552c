package graft.kvstore

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecordBuilder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{SequenceFile, Text}

import graft.SparkSpec

/** Unit tests per store implementation — mirrors the reference's
  * kvstore/lib test suite (TestTextFileKeyValueStore,
  * TestInMemoryMapKeyValueStore, TestAvroRecordKeyValueStore, ...). */
class KeyValueStoreSpec extends SparkSpec {

  test("in-memory map store: get/containsKey/missing") {
    val r = InMemoryMapKeyValueStore(Map("a" -> 1, "b" -> 2)).reader()
    assert(r.get("a").contains(1))
    assert(r.containsKey("b"))
    assert(r.get("zzz").isEmpty)
  }

  test("text file store: tab default, first-delimiter split, edge cases") {
    val f = Paths.get(tmpDir("kvtext"), "kv.txt")
    Files.write(f, java.util.List.of(
      "alpha\t1", "beta\t2\twith\ttabs", "nodelim", "empty\t", "dup\tfirst",
      "dup\tsecond"), StandardCharsets.UTF_8)
    val r = TextFileKeyValueStore(f.toString).reader()
    assert(r.get("alpha").contains("1"))
    // only the FIRST delimiter splits (TextFileKeyValueStore.java:46-83)
    assert(r.get("beta").contains("2\twith\ttabs"))
    // no delimiter -> whole line is the key, empty value
    assert(r.get("nodelim").contains(""))
    assert(r.get("empty").contains(""))
    // later lines win on duplicate key
    assert(r.get("dup").contains("second"))
  }

  test("text + avro stores open through the Hadoop FileSystem (file:// URI)") {
    // The reference ships store files from HDFS (FileStoreHelper via
    // DistributedCache); loads must go through the Hadoop FS API so
    // hdfs:// paths work — a file:// URI exercises that code path.
    val f = Paths.get(tmpDir("kvhdfs"), "kv.txt")
    Files.write(f, java.util.List.of("a\t1", "b\t2"), StandardCharsets.UTF_8)
    val r = TextFileKeyValueStore(f.toUri.toString).reader()
    assert(r.get("a").contains("1") && r.get("b").contains("2"))

    val schema: Schema = SchemaBuilder.record("E").fields()
      .requiredString("key").requiredString("val").endRecord()
    val af = new java.io.File(tmpDir("kvhdfsavro"), "kv.avro")
    val w = new DataFileWriter(new GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, af)
    w.append(new GenericRecordBuilder(schema).set("key", "k").set("val", "v").build())
    w.close()
    val ar = AvroRecordKeyValueStore(af.toURI.toString, "key", "val").reader()
    assert(ar.get("k").contains("v"))
  }

  test("text file store: CRLF line endings don't leak \\r into keys/values") {
    val f = Paths.get(tmpDir("kvcrlf"), "kv.txt")
    Files.write(f, "a\t1\r\nb\t2\r\nnodelim\r\n".getBytes(StandardCharsets.UTF_8))
    val r = TextFileKeyValueStore(f.toString).reader()
    assert(r.get("a").contains("1"))
    assert(r.get("b").contains("2"))
    assert(r.get("nodelim").contains(""))
  }

  test("text file store: custom delimiter") {
    val f = Paths.get(tmpDir("kvtext2"), "kv.csv")
    Files.write(f, java.util.List.of("x,1", "y,2"), StandardCharsets.UTF_8)
    val r = TextFileKeyValueStore(f.toString, ",").reader()
    assert(r.get("x").contains("1"))
    assert(r.get("y").contains("2"))
  }

  test("avro record store: indexed by named key field") {
    val schema: Schema = SchemaBuilder.record("Entry").fields()
      .requiredString("key").requiredString("val").endRecord()
    val f = new java.io.File(tmpDir("kvavro"), "kv.avro")
    val w = new DataFileWriter(new GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, f)
    w.append(new GenericRecordBuilder(schema).set("key", "k1").set("val", "v1").build())
    w.append(new GenericRecordBuilder(schema).set("key", "k2").set("val", "v2").build())
    w.close()
    val r = AvroRecordKeyValueStore(f.toString, "key", "val").reader()
    assert(r.get("k1").contains("v1"))
    assert(r.get("k2").contains("v2"))
    assert(r.get("k3").isEmpty)
  }

  test("avro KV store: fixed key/value fields; extra fields ignored") {
    val schema: Schema = SchemaBuilder.record("KV").fields()
      .requiredString("key").requiredString("value")
      .requiredInt("ignored").endRecord()
    val f = new java.io.File(tmpDir("kvavrokv"), "kv.avro")
    val w = new DataFileWriter(new GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, f)
    w.append(new GenericRecordBuilder(schema)
      .set("key", "a").set("value", "1").set("ignored", 9).build())
    w.append(new GenericRecordBuilder(schema)
      .set("key", "b").set("value", "2").set("ignored", 8).build())
    w.close()
    val r = AvroKVRecordKeyValueStore(f.toString).reader()
    assert(r.get("a").contains("1"))
    assert(r.get("b").contains("2"))
    assert(r.get("c").isEmpty)
  }

  test("sequence file store") {
    val p = new Path(tmpDir("kvseq"), "kv.seq")
    val wr = SequenceFile.createWriter(new Configuration(),
      SequenceFile.Writer.file(p),
      SequenceFile.Writer.keyClass(classOf[Text]),
      SequenceFile.Writer.valueClass(classOf[Text]))
    wr.append(new Text("s1"), new Text("one"))
    wr.append(new Text("s2"), new Text("two"))
    wr.close()
    val r = SeqFileKeyValueStore(p.toString).reader()
    assert(r.get("s1").contains("one"))
    assert(r.get("s2").contains("two"))
  }

  test("table store: point lookup over another table's projection") {
    import spark.implicits._
    val df = Seq((1L, "us"), (2L, "fr")).toDF("id", "country")
    val r = new TableKeyValueStore(df, "id", "country").reader()
    assert(r.get("1").contains("us"))
    assert(r.get("2").contains("fr"))
    assert(r.get("3").isEmpty)
  }

  test("table store: over-limit point-get load fails fast; lookupJoin has no cap") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val capped = new TableKeyValueStore(df, "id", "v", maxRows = 10)
    intercept[IllegalStateException] { capped.reader() }
    // the broadcast-join scale path is unaffected by the point-get cap
    val joined = capped.lookupJoin(Seq(5L).toDF("k"), col("k"), as = "v")
    assert(joined.collect().map(_.getString(1)).toSeq == Seq("v5"))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("empty store: always None; unconfigured store: error on use") {
    assert(EmptyKeyValueStore[String, String]().reader().get("x").isEmpty)
    intercept[IllegalStateException] {
      UnconfiguredKeyValueStore[String, String]().reader()
    }
  }

  test("toDF gives the broadcast-join view") {
    import spark.implicits._
    val df = InMemoryMapKeyValueStore(Map("a" -> "1", "b" -> "2")).toDF(spark)
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "1"), ("b", "2")))
  }
}
