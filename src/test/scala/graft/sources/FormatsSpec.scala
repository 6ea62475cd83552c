package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("spec parser: dispatches format= and passes options; rejects junk") {
    val dir = tmpDir("fmtspec")
    Files.write(Paths.get(dir, "a.csv"),
      "k,v\n1,x\n2,y\n".getBytes(StandardCharsets.UTF_8))
    val df = Formats.read(spark, s"format=csv file=$dir header=true")
    assert(df.count() == 2 && df.columns.toSeq == Seq("k", "v"))
    intercept[IllegalArgumentException](Formats.read(spark, "file=/x"))
    intercept[IllegalArgumentException](Formats.read(spark, "format=bogus file=/x"))
    intercept[IllegalArgumentException](Formats.read(spark, "format=csv no-equals"))
  }

  test("xml: records spanning lines, junk between records, custom tag") {
    val dir = tmpDir("fmtxml")
    Files.write(Paths.get(dir, "r.xml"),
      """<header>ignored</header>
        |<rec><a>1</a>
        |<b>two</b></rec>
        |garbage between records
        |<rec><a>3</a><b>four</b></rec>
        |trailing junk""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val recs = Formats.readXml(spark, dir, "rec")
      .as[String].collect().sorted
    assert(recs.length == 2)
    assert(recs(0) == "<rec><a>1</a>\n<b>two</b></rec>")
    assert(recs(1) == "<rec><a>3</a><b>four</b></rec>")
  }

  test("whole files: one record per file with full content") {
    val dir = tmpDir("fmtwhole")
    Files.write(Paths.get(dir, "f1.txt"), "line1\nline2\n".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(dir, "f2.txt"), "only\n".getBytes(StandardCharsets.UTF_8))
    val out = Formats.readWholeFiles(spark, dir).collect()
      .map(r => (r.getAs[String]("path").split('/').last,
        new String(r.getAs[Array[Byte]]("content"), StandardCharsets.UTF_8)))
      .toMap
    assert(out("f1.txt") == "line1\nline2\n")
    assert(out("f2.txt") == "only\n")
  }

  test("sequence file roundtrip") {
    val dir = tmpDir("fmtseq") + "/out"
    Formats.writeSeqFile(Seq(("a", "1"), ("b", "2")).toDF("k", "v"), dir)
    val back = Formats.readSeqFile(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(("a", "1"), ("b", "2")))
  }

  test("avro sequence file roundtrip: record values, schemas from metadata") {
    import org.apache.spark.sql.functions.struct
    val dir = tmpDir("fmtavroseq") + "/out"
    val df = Seq((1L, "a", 1.5), (2L, "bb", -2.5)).toDF("k", "s", "p")
      .select($"k", struct($"s", $"p").as("v"))
    Formats.writeAvroSeqFile(df, dir, "\"long\"",
      """{"type":"record","name":"V","fields":[
        |{"name":"s","type":"string"},
        |{"name":"p","type":"double"}]}""".stripMargin)
    // readSeqFile sniffs the header and takes the Avro path on its own.
    val back = Formats.readSeqFile(spark, dir)
      .selectExpr("key", "value.s", "value.p")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back == Set((1L, "a", 1.5), (2L, "bb", -2.5)))
  }

  test("seq source: glob paths resolve (sc.sequenceFile parity)") {
    val dir = tmpDir("fmtseqglob") + "/out"
    Formats.writeSeqFile(Seq(("a", "1"), ("b", "2")).toDF("k", "v"), dir)
    val back = Formats.readSeqFile(spark, s"$dir/part-*").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(("a", "1"), ("b", "2")))
  }

  test("seq source: a non-Text non-Avro key class fails loudly") {
    import org.apache.hadoop.io.{LongWritable, SequenceFile, Text}
    val dir = tmpDir("fmtseqbad")
    val p = new org.apache.hadoop.fs.Path(dir, "part-r-00000")
    val conf = spark.sparkContext.hadoopConfiguration
    val w = SequenceFile.createWriter(conf,
      SequenceFile.Writer.file(p),
      SequenceFile.Writer.keyClass(classOf[LongWritable]),
      SequenceFile.Writer.valueClass(classOf[Text]))
    w.append(new LongWritable(1L), new Text("x")); w.close()
    val e = intercept[IllegalArgumentException](Formats.readSeqFile(spark, dir))
    assert(e.getMessage.contains("key class"))
  }

  test("avro roundtrip preserves typed values") {
    val dir = tmpDir("fmtavro") + "/out"
    Formats.writeAvro(Seq((1L, 2.5, "x"), (2L, -0.125, "y")).toDF("id", "score", "tag"),
      dir,
      """{"type":"record","name":"R","fields":[
        |{"name":"id","type":"long"},
        |{"name":"score","type":"double"},
        |{"name":"tag","type":"string"}]}""".stripMargin)
    val df = Formats.readAvro(spark, dir)
    // The writer schema comes from the container header, so fields surface
    // with their declared types — no stringly-typed casting required.
    assert(df.schema.map(f => (f.name, f.dataType)) == Seq(
      ("id", org.apache.spark.sql.types.LongType),
      ("score", org.apache.spark.sql.types.DoubleType),
      ("tag", org.apache.spark.sql.types.StringType)))
    val back = df
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(back == Set((1L, 2.5, "x"), (2L, -0.125, "y")))
  }

  test("avro reader: nullable unions and array fields") {
    val dir = tmpDir("fmtavronull") + "/out"
    import org.apache.avro.Schema
    import org.apache.avro.generic.GenericData
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.GenericDatumWriter
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"N","fields":[
        |{"name":"id","type":"long"},
        |{"name":"note","type":["null","string"],"default":null},
        |{"name":"xs","type":{"type":"array","items":"int"}}]}""".stripMargin)
    java.nio.file.Files.createDirectories(Paths.get(dir))
    val w = new DataFileWriter(new GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part.avro"))
    val r1 = new GenericData.Record(schema)
    r1.put("id", 1L); r1.put("note", "hi")
    r1.put("xs", java.util.Arrays.asList(1, 2, 3))
    val r2 = new GenericData.Record(schema)
    r2.put("id", 2L); r2.put("note", null)
    r2.put("xs", java.util.Collections.emptyList[Integer]())
    w.append(r1); w.append(r2); w.close()
    val back = Formats.readAvro(spark, dir)
      .selectExpr("id", "note", "size(xs) AS n")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSet
    assert(back == Set((1L, Some("hi"), 3), (2L, None, 0)))
  }

  test("json lines: explicit schema skips inference, malformed lines survive") {
    val dir = tmpDir("fmtjson")
    Files.write(Paths.get(dir, "d.jsonl"),
      """{"doc_id": 1, "lang": "en", "n_chars": 10}
        |{"doc_id": 2, "lang": "de", "n_chars": 20}
        |this line is not json
        |{"doc_id": 3, "lang": "en", "n_chars": 30}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    // via the CLI spec (compact colon schema form): types are PINNED, not
    // inferred — and the schema must include _corrupt_record to observe
    // the malformed line under PERMISSIVE mode
    val df = Formats.read(spark,
      s"format=json file=$dir schema=doc_id:BIGINT,lang:STRING,n_chars:BIGINT,_corrupt_record:STRING")
    assert(df.schema("doc_id").dataType.typeName == "long")
    // one materialization of ALL columns (Spark disallows queries that
    // reference ONLY the corrupt-record column from raw json)
    val rows = df.collect().map(r =>
      (Option(r.get(0)).map(_.asInstanceOf[Long]), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.getString(3))))
    val good = rows.filter(_._4.isEmpty)
      .map(r => (r._1.get, r._2.get, r._3.get)).toSet
    assert(good == Set((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L)))
    // the malformed line is captured, not dropped and not fatal
    assert(rows.count(_._4.nonEmpty) == 1)
    // an explicit schema WITHOUT _corrupt_record keeps the declared
    // contract exactly (no silent widening — CLI sinks pin this schema);
    // the malformed line then surfaces as an all-null row, and callers
    // wanting the accounting declare the column (as above)
    val bare = Formats.readJsonLines(spark, dir,
      Some("doc_id BIGINT, lang STRING, n_chars BIGINT"))
    assert(bare.columns.toSeq == Seq("doc_id", "lang", "n_chars"))
    assert(bare.collect().count(r => r.isNullAt(0) && r.isNullAt(1) &&
      r.isNullAt(2)) == 1)
    // without a schema the reader still works (inference pre-pass);
    // the malformed line still yields a (corrupt) row, not a failure
    val inferred = Formats.readJsonLines(spark, dir)
    assert(inferred.count() == 4)
    assert(inferred.columns.contains("doc_id"))
  }
}
