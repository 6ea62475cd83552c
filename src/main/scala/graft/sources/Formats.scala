package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{NullWritable, Text}
import org.apache.hadoop.mapreduce.Job
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The job input/output format surface (SURVEY §2.2/§2.3), behind the
  * `format=` dispatch of the reference CLI
  * (`KM/tools/framework/JobInputSpec.java:52-70`: `avro, avrokv, htable,
  * seq, small-text-files, text, kiji, xml`).
  *
  * Scale notes per format:
  *  - text/csv: Spark's splittable readers — free parallelism.
  *  - xml: tag-delimited records via Hadoop's `textinputformat.record.
  *    delimiter` — records can span lines AND splits; the LineRecordReader
  *    overrun logic is exactly what the reference's XMLInputFormat
  *    reimplemented by hand (`KM/input/impl/XMLInputFormat.java:54-66`).
  *  - small-text-files: `binaryFile` — one record per file, the
  *    WholeFileInputFormat analog (`KM/input/impl/WholeFileInputFormat
  *    .java:42-51`); parallelism = #files, as in the reference.
  *  - seq/avro: Hadoop new-API input/output formats through
  *    `newAPIHadoopFile` / `saveAsNewAPIHadoopFile` (no extra deps).
  */
object Formats {

  /** THE spec tokenizer (`format=... file=... [key=value ...]`) — shared
    * by [[read]] and every other consumer of the CLI spec syntax (e.g.
    * the streaming index-serve path), so malformed tokens fail with one
    * message and the grammar cannot drift between call sites. */
  def parseSpec(spec: String): Map[String, String] =
    spec.trim.split("\\s+").map { tok =>
      val i = tok.indexOf('=')
      require(i > 0, s"malformed spec token '$tok' (expected key=value)")
      tok.take(i) -> tok.drop(i + 1)
    }.toMap

  /** `format=... file=... [key=value ...]` spec parser + dispatch. */
  def read(spark: SparkSession, spec: String): DataFrame = {
    val kv = parseSpec(spec)
    def file = kv.getOrElse("file",
      throw new IllegalArgumentException(s"spec missing file=: '$spec'"))
    kv.getOrElse("format",
      throw new IllegalArgumentException(s"spec missing format=: '$spec'")) match {
      // the engine's native columnar format (beyond the reference's
      // input list, which predates columnar storage) — the index-tier
      // verbs read their corpora/batches this way
      case "parquet" => spark.read.parquet(file)
      case "text" => readText(spark, file)
      case "csv" => readCsv(spark, file,
        header = kv.getOrElse("header", "true").toBoolean,
        delimiter = kv.getOrElse("delim", ","))
      // spec tokens are whitespace-split, so the CLI schema form is
      // compact colon pairs: schema=doc_id:BIGINT,name:STRING
      case "json" => readJsonLines(spark, file,
        kv.get("schema").map(_.replace(":", " ")))
      case "small-text-files" => readWholeFiles(spark, file)
      case "xml" => readXml(spark, file, kv.getOrElse("tag", "row"))
      case "seq" => readSeqFile(spark, file)
      case "avro" => readAvro(spark, file)
      case "avrokv" => readAvroKV(spark, file)
      case "kiji" => readKijiTable(spark, kv)
      case "htable" => throw new UnsupportedOperationException(
        "format=htable (raw HBase table input, HTableMapReduceJobInput) is " +
          "PERMANENTLY out of scope (SURVEY §2.2): this engine has no live " +
          "HBase cluster to scan, and an HBase connector would be its only " +
          "consumer. Migration recipe for live HBase data: (1) snapshot-" +
          "export the table to cell files (HBase's Export / a one-off " +
          "TableInputFormat dump of (rowkey, family, qualifier, ts, value) " +
          "rows as parquet); (2) bulk-load them here (graft.Tool bulk-load " +
          "--hfiles=<export> --table=<path>, or EntityTable.bulkLoad); " +
          "(3) read with format=kiji table=<path> — every scan feature " +
          "(column pruning, maxversions, timerange, as-of) applies")
      case other => throw new IllegalArgumentException(s"unknown format '$other'")
    }
  }

  /** `format=kiji table=<path> [layout=<layout.json>] [maxversions=N]
    * [columns=fam:qual,...] [timerange=lo,hi] [startrow=K] [limitrow=K]
    * [asof=<feedTs>]`
    * — the reference CLI's primary input shape
    * (`KM/tools/framework/JobInputSpec.java:52-70`,
    * `KM/tools/KijiGather.java:38-44`: a table scan under a
    * KijiDataRequest with optional start/limit row keys,
    * `KM/framework/KijiTableInputFormat.java:87-120`). `maxversions=1`
    * (the default, as in KijiDataRequest) yields the flat most-recent row
    * shape operators consume; >1 yields the versions-array shape of
    * `EntityTable.read`. The row-key range is a plain predicate on
    * `entity_id` (string order == key order for RAW and zero-padded
    * FORMATTED keys), so it reaches the parquet scan as a pushed filter
    * and prunes range-partitioned files by min/max stats — the
    * region-pruned scan of the reference.
    *
    * `asof=<feedTs>` is the operational time-travel read
    * (`EntityTable.readAsOf`): the scan serves the table as it stood when
    * the change feed was cut at that ts — the rollback/debug read, now
    * reachable from the CLI like any other scan knob. Cuts below a major
    * compaction's watermark refuse with guidance (see `cellsAsOf`).
    * NOTE the cut is by LOGICAL cell ts, not append order — a correction
    * batch stamped with a smaller ts shows up in "earlier" snapshots;
    * `asofordinal=<batch>` is the strict batch-arrival cut
    * (`EntityTable.readAsOfOrdinal`: the view after the first N
    * appendChanges batches, whatever their timestamps). The two axes are
    * mutually exclusive in one spec. */
  def readKijiTable(spark: SparkSession, kv: Map[String, String]): DataFrame = {
    import graft.table.{DataRequest, EntityTable, LayoutJson, TableLayout}
    val tablePath = kv.getOrElse("table",
      throw new IllegalArgumentException("format=kiji spec missing table="))
    val layout = kv.get("layout").map(LayoutJson.parseFile)
      .getOrElse(TableLayout(new Path(tablePath).getName, Seq.empty))
    val table = new EntityTable(spark, tablePath, layout)
    val columns = kv.get("columns").toSeq.flatMap(_.split(",")).map { c =>
      val i = c.indexOf(':')
      require(i > 0, s"bad columns= entry '$c' (expected family:qualifier)")
      (c.take(i), c.drop(i + 1))
    }
    val maxVersions = kv.get("maxversions").map(_.toInt).getOrElse(1)
    val timeRange = kv.get("timerange").map { s =>
      val parts = s.split(",", 2)
      require(parts.length == 2,
        s"bad timerange= '$s' (expected lo,hi in micros)")
      (parts(0).toLong, parts(1).toLong)
    }
    val req = DataRequest(columns, maxVersions, timeRange)
    val feedTs = kv.get("asof").map(_.toLong).getOrElse(Long.MaxValue)
    val ordinal = kv.get("asofordinal").map(_.toLong)
    require(ordinal.isEmpty || !kv.contains("asof"),
      "asof= (logical-ts cut) and asofordinal= (batch-arrival cut) are " +
        "different history axes — pass one, not both")
    val scanned = (ordinal, maxVersions) match {
      case (Some(o), 1) => table.mostRecentAsOfOrdinal(o, req)
      case (Some(o), _) => table.readAsOfOrdinal(o, req)
      case (None, 1) => table.mostRecentAsOf(feedTs, req)
      case (None, _) => table.readAsOf(feedTs, req)
    }
    val ranged = kv.get("startrow")
      .map(k => scanned.filter(col("entity_id") >= k)).getOrElse(scanned)
    kv.get("limitrow")
      .map(k => ranged.filter(col("entity_id") < k)).getOrElse(ranged)
  }

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
              delimiter: String = ","): DataFrame =
    spark.read.option("header", header).option("delimiter", delimiter).csv(path)

  /** JSON-lines records (one JSON object per line — splittable, the
    * interchange format most crawl/curation pipelines emit). An explicit
    * DDL schema (`schema=name STRING, n BIGINT`) skips Spark's
    * whole-dataset inference pre-pass — at 100 TB, inference is a full
    * extra scan, so production reads should always pass one.
    *
    * Malformed-line accounting: PERMISSIVE mode never fails the job, but
    * it only captures the offending line when a `_corrupt_record STRING`
    * column is PART OF THE DECLARED SCHEMA — with an explicit schema that
    * omits it, a malformed line silently becomes an all-null row,
    * indistinguishable from a row of JSON nulls. Callers who need the
    * accounting declare the column themselves (see FormatsSpec); it is
    * deliberately NOT auto-appended here, because the reader's output
    * schema is a contract — CLI jobs pipe it straight into sinks, and a
    * silently widened schema breaks pinned downstream consumers. */
  def readJsonLines(spark: SparkSession, path: String,
                    ddlSchema: Option[String] = None): DataFrame = {
    val r = spark.read.option("mode", "PERMISSIVE")
    ddlSchema.fold(r)(s => r.schema(s)).json(path)
  }

  /** One record per (small) file: (path, length, content-bytes). Hidden
    * files (.crc checksums, _SUCCESS markers) are excluded — binaryFile
    * does not apply the usual leading-dot/underscore filter to globs. */
  def readWholeFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .filter(!col("path").rlike("/[._][^/]*$"))
      .select(col("path"), col("length"), col("content"))

  /** Tag-delimited XML records: one row per `<tag>...</tag>` block.
    * Splittable: Hadoop breaks records on the END tag, so a record spanning
    * an input-split boundary is read whole by the split that owns its start
    * — the reference's overrun allowance, for free. */
  def readXml(spark: SparkSession, path: String, tag: String): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", s"</$tag>")
    val start = s"<$tag>"
    val rdd = spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable], classOf[Text], conf)
      .map(_._2.toString)
      .flatMap { chunk =>
        val i = chunk.indexOf(start)
        if (i < 0) None else Some(chunk.substring(i) + s"</$tag>")
      }
    spark.createDataFrame(rdd.map(Row(_)),
      StructType(Seq(StructField("record", StringType))))
  }

  /** Driver-side header sniff of a sequence file (or the first part file
    * of a directory): declared key class + file metadata. A few-KB read,
    * same cost class as a parquet footer. */
  private def seqFileHeader(spark: SparkSession,
                            path: String): (String, Map[String, String]) = {
    // Reader.init instantiates key/value deserializers up front, so the
    // Avro wrapper serialization must be registered even just to read the
    // header. Copied conf: never mutate the session-wide one.
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    org.apache.avro.hadoop.io.AvroSerialization.addToConfiguration(conf)
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // Glob-aware like sc.sequenceFile itself: `path` may be a file, a
    // directory, or a glob; directories expand one level to part files.
    val file = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .flatMap(st => if (st.isFile) Array(st) else fs.listStatus(st.getPath))
      .filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      .map(_.getPath).sortBy(_.toString).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"no sequence part files match $path"))
    val reader = new org.apache.hadoop.io.SequenceFile.Reader(conf,
      org.apache.hadoop.io.SequenceFile.Reader.file(file))
    try {
      import scala.jdk.CollectionConverters._
      val meta = reader.getMetadata.getMetadata.asScala
        .map { case (k, v) => k.toString -> v.toString }.toMap
      (reader.getKeyClassName, meta)
    } finally reader.close()
  }

  /** SequenceFile source with header dispatch: Text/Text pairs surface as
    * string columns, Avro-valued files (the reference's
    * `AvroSequenceFileInputFormat` path, `KM/input/SequenceFileMapReduce
    * JobInput.java:50-64`) are decoded with their embedded schemas, and
    * any other Writable key class fails loudly instead of yielding
    * garbage strings. */
  def readSeqFile(spark: SparkSession, path: String): DataFrame =
    seqFileHeader(spark, path) match {
      case (k, _) if k == classOf[Text].getName =>
        val rdd = spark.sparkContext
          .sequenceFile(path, classOf[Text], classOf[Text])
          .map { case (k, v) => Row(k.toString, v.toString) }
        spark.createDataFrame(rdd, StructType(Seq(
          StructField("key", StringType), StructField("value", StringType))))
      case (k, meta) if k == classOf[AvroKey[_]].getName =>
        readAvroSeqFile(spark, path, Some(meta)) // reuse the sniffed header
      case (other, _) => throw new IllegalArgumentException(
        s"sequence file at $path has key class $other — only Text/Text and " +
          "Avro (AvroKey/AvroValue) sequence files are supported")
    }

  /** Avro-valued sequence files: key/value schemas come from the file
    * metadata `AvroSequenceFile` writes (`avro.key.schema` /
    * `avro.value.schema`), so the read is self-describing — the direct
    * analog of the reference's `AvroSequenceFileInputFormat` job input. */
  def readAvroSeqFile(spark: SparkSession, path: String,
                      knownMeta: Option[Map[String, String]] = None): DataFrame = {
    import org.apache.avro.hadoop.io.{AvroSequenceFile => ASF}
    import org.apache.avro.mapred.AvroValue
    import org.apache.avro.mapreduce.AvroSequenceFileInputFormat
    val meta = knownMeta.getOrElse(seqFileHeader(spark, path)._2)
    def schemaOf(field: Text): String = meta.getOrElse(field.toString,
      throw new IllegalArgumentException(
        s"sequence file at $path lacks $field metadata — not written by " +
          "AvroSequenceFile (use writeAvroSeqFile / the avro CLI formats)"))
    val keyJson = schemaOf(ASF.METADATA_FIELD_KEY_SCHEMA)
    val valJson = schemaOf(ASF.METADATA_FIELD_VALUE_SCHEMA)
    val keySchema = new Schema.Parser().parse(keyJson)
    val valSchema = new Schema.Parser().parse(valJson)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, keySchema)
    AvroJob.setInputValueSchema(job, valSchema)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroSequenceFileInputFormat[AvroKey[Any], AvroValue[Any]]],
      classOf[AvroKey[Any]], classOf[AvroValue[Any]], job.getConfiguration)
    // Row conversion inside the reading task (wrappers are not serializable).
    val rows = rdd.mapPartitions { it =>
      val ks = new Schema.Parser().parse(keyJson)
      val vs = new Schema.Parser().parse(valJson)
      it.map { case (k, v) =>
        Row(avroValue(k.datum(), ks), avroValue(v.datum(), vs))
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("key", avroToCatalyst(keySchema)),
      StructField("value", avroToCatalyst(valSchema)))))
  }

  /** Reads the writer schema from an Avro container's file header — a
    * driver-side metadata read of a few KB, same cost class as a parquet
    * footer read. Picks the first `.avro` part file under `path`. */
  def avroWriterSchema(spark: SparkSession, path: String): Schema = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(p).isFile) p
      else fs.listStatus(p).map(_.getPath)
        .find(_.getName.endsWith(".avro"))
        .getOrElse(throw new IllegalArgumentException(
          s"no .avro container files under $path"))
    val in = fs.open(file)
    try {
      val stream = new org.apache.avro.file.DataFileStream(
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try stream.getSchema finally stream.close()
    } finally in.close()
  }

  /** Avro schema → Catalyst type. Supports the container-file subset the
    * reference's importers use (`KM/input/AvroKeyMapReduceJobInput.java`):
    * primitives, nullable `[null, T]` unions, arrays, and nested records. */
  def avroToCatalyst(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ARRAY => ArrayType(avroToCatalyst(s.getElementType))
    case Schema.Type.RECORD => StructType(s.getFields.toArray.map {
      case f: Schema.Field => StructField(f.name, avroToCatalyst(f.schema))
    })
    case Schema.Type.UNION =>
      val branches = s.getTypes.toArray.collect {
        case b: Schema if b.getType != Schema.Type.NULL => b
      }
      require(branches.length == 1,
        s"only [null, T] unions supported, got $s")
      avroToCatalyst(branches.head)
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  private def avroValue(v: Any, s: Schema): Any = (s.getType, v) match {
    case (_, null) => null
    case (Schema.Type.UNION, x) =>
      val branch = s.getTypes.toArray.collectFirst {
        case b: Schema if b.getType != Schema.Type.NULL => b
      }.get
      avroValue(x, branch)
    case (Schema.Type.STRING | Schema.Type.ENUM, x) => x.toString
    case (Schema.Type.BYTES, x: java.nio.ByteBuffer) =>
      val b = new Array[Byte](x.remaining); x.duplicate.get(b); b
    case (Schema.Type.FIXED, x: org.apache.avro.generic.GenericFixed) => x.bytes
    case (Schema.Type.ARRAY, x: java.util.Collection[_]) =>
      x.toArray.map(avroValue(_, s.getElementType)).toSeq
    case (Schema.Type.RECORD, x: GenericRecord) =>
      // By NAME, not position: part files written by different schema
      // generations may order fields differently than the reader schema.
      Row(s.getFields.toArray.toIndexedSeq.map {
        case f: Schema.Field => avroValue(x.get(f.name), f.schema)
      }: _*)
    case (_, x) => x
  }

  /** Avro container files via avro-mapred, properly typed: the writer
    * schema comes from the file header (no data action), fields keep their
    * declared types instead of being stringified. */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val writerSchema = avroWriterSchema(spark, path)
    val schemaJson = writerSchema.toString
    val structType = avroToCatalyst(writerSchema).asInstanceOf[StructType]
    // Declare the reader schema: every part file (whatever its writer
    // generation) is then resolved to this one schema by Avro's schema
    // resolution, instead of each part surfacing its own writer schema.
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, writerSchema)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path, classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      job.getConfiguration)
    // Convert to Row inside the reading task: GenericRecord itself is not
    // serializable across stage boundaries.
    val rows = rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { case (k, _) =>
        avroValue(k.datum(), schema).asInstanceOf[Row]
      }
    }
    spark.createDataFrame(rows, structType)
  }

  /** Avro key/value container files (`KM/input/AvroKeyValueMapReduceJob
    * Input.java`): generic records with `key`/`value` fields → 2 columns. */
  def readAvroKV(spark: SparkSession, path: String): DataFrame = {
    val df = readAvro(spark, path)
    require(df.columns.contains("key") && df.columns.contains("value"),
      s"avrokv input at $path must have key/value fields, got ${df.columns.mkString(",")}")
    df.select(col("key"), col("value"))
  }

  // ── sinks ───────────────────────────────────────────────────────────────

  private def deleteDir(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** (key, value) string pairs → SequenceFile
    * (`KM/output/SequenceFileMapReduceJobOutput.java`). */
  def writeSeqFile(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    deleteDir(spark, path)
    df.rdd.map(r => (new Text(r.getString(0)), new Text(r.getString(1))))
      .saveAsNewAPIHadoopFile(path, classOf[Text], classOf[Text],
        classOf[SequenceFileOutputFormat[Text, Text]])
  }

  /** Catalyst value → Avro datum per a target schema. Covers the primitive
    * + nested-record subset [[avroToCatalyst]] reads back. */
  private def toAvroDatum(v: Any, s: Schema): AnyRef = (s.getType, v) match {
    case (_, null) => null
    case (Schema.Type.UNION, x) =>
      val branch = s.getTypes.toArray.collectFirst {
        case b: Schema if b.getType != Schema.Type.NULL => b
      }.get
      toAvroDatum(x, branch)
    case (Schema.Type.LONG, x: Number) => java.lang.Long.valueOf(x.longValue)
    case (Schema.Type.INT, x: Number) => java.lang.Integer.valueOf(x.intValue)
    case (Schema.Type.DOUBLE, x: Number) => java.lang.Double.valueOf(x.doubleValue)
    case (Schema.Type.FLOAT, x: Number) => java.lang.Float.valueOf(x.floatValue)
    case (Schema.Type.BOOLEAN, x: java.lang.Boolean) => x
    case (Schema.Type.BYTES, x: Array[Byte]) => java.nio.ByteBuffer.wrap(x)
    case (Schema.Type.ARRAY, x: scala.collection.Seq[_]) =>
      val out = new java.util.ArrayList[AnyRef](x.length)
      x.foreach(e => out.add(toAvroDatum(e, s.getElementType)))
      out
    case (Schema.Type.RECORD, x: Row) =>
      val rec = new GenericData.Record(s)
      s.getFields.forEach { f =>
        rec.put(f.name, toAvroDatum(x.get(x.fieldIndex(f.name)), f.schema))
      }
      rec
    case (_, x) => String.valueOf(x)
  }

  /** First two columns → Avro-valued sequence file with the given key and
    * value schemas (JSON), written through `AvroSequenceFileOutputFormat`
    * — schemas land in the file metadata, so [[readSeqFile]]'s header
    * dispatch decodes it back without external configuration. */
  def writeAvroSeqFile(df: DataFrame, path: String,
                       keySchemaJson: String, valueSchemaJson: String): Unit = {
    import org.apache.avro.mapred.AvroValue
    import org.apache.avro.mapreduce.AvroSequenceFileOutputFormat
    val spark = df.sparkSession
    deleteDir(spark, path)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(keySchemaJson))
    AvroJob.setOutputValueSchema(job, new Schema.Parser().parse(valueSchemaJson))
    df.rdd.mapPartitions { it =>
      val ks = new Schema.Parser().parse(keySchemaJson)
      val vs = new Schema.Parser().parse(valueSchemaJson)
      it.map { row =>
        (new AvroKey[Any](toAvroDatum(row.get(0), ks)),
          new AvroValue[Any](toAvroDatum(row.get(1), vs)))
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[Any]], classOf[AvroValue[Any]],
      classOf[AvroSequenceFileOutputFormat[AvroKey[Any], AvroValue[Any]]],
      job.getConfiguration)
  }

  /** Sorted key/value MapFiles — the `MapFileMapReduceJobOutput.java:51-69`
    * analog: per-file sorted `data` + `index` pairs supporting binary-search
    * point gets. Rows are range-partitioned then sorted within partitions,
    * so file key-ranges are disjoint AND each file is internally sorted —
    * at scale a reader prunes to one file by range, then seeks by index
    * (exactly the HFile shape, over Hadoop's stock format). */
  def writeMapFile(df: DataFrame, path: String, numPartitions: Int = 1): Unit = {
    val spark = df.sparkSession
    deleteDir(spark, path)
    val kv = df.selectExpr(
      s"CAST(${df.columns(0)} AS STRING) AS k",
      s"CAST(${df.columns(1)} AS STRING) AS v")
    val arranged =
      if (numPartitions == 1) kv.repartition(1).sortWithinPartitions("k")
      else kv.repartitionByRange(numPartitions, col("k")).sortWithinPartitions("k")
    arranged.rdd.map(r => (new Text(r.getString(0)), new Text(r.getString(1))))
      .saveAsNewAPIHadoopFile(path, classOf[Text], classOf[Text],
        classOf[org.apache.hadoop.mapreduce.lib.output.MapFileOutputFormat])
  }

  /** Point lookup against a MapFile directory written by [[writeMapFile]]
    * (the MapFileOutputFormat.getEntry read side). */
  def mapFileGet(spark: SparkSession, path: String, key: String): Option[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val readers = org.apache.hadoop.mapreduce.lib.output.MapFileOutputFormat
      .getReaders(new Path(path), conf)
    try {
      val v = new Text()
      val hit = readers.exists(r => r.get(new Text(key), v) != null)
      if (hit) Some(v.toString) else None
    } finally readers.foreach(_.close())
  }

  /** Avro record schema (JSON) derived from a DataFrame's column types —
    * for sinks where the user supplies no explicit schema (CLI `avro`
    * output). Non-primitive columns fall back to their string form. */
  def avroSchemaJson(df: DataFrame, recordName: String = "GraftRecord"): String = {
    val fields = df.schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => "\"long\""
        case IntegerType => "\"int\""
        case DoubleType => "\"double\""
        case FloatType => "\"float\""
        case BooleanType => "\"boolean\""
        case _ => "\"string\""
      }
      s"""{"name":"${f.name}","type":$t}"""
    }.mkString(",")
    s"""{"type":"record","name":"$recordName","fields":[$fields]}"""
  }

  /** First two columns → Avro key/value container records — the write side
    * of [[readAvroKV]] (`KM/output/AvroKeyValueMapReduceJobOutput.java`:
    * generic records with `key`/`value` fields, types taken from the
    * frame's column types). */
  def writeAvroKV(df: DataFrame, path: String): Unit = {
    require(df.columns.length >= 2,
      s"avrokv output needs at least (key, value) columns, got ${df.columns.mkString(",")}")
    val kvDf = df.select(col(df.columns(0)).as("key"), col(df.columns(1)).as("value"))
    writeAvro(kvDf, path, avroSchemaJson(kvDf, "KeyValuePair"))
  }

  /** Rows → Avro container files with the given record schema (JSON).
    * All fields are written from the row's string form, typed per schema
    * (`KM/output/AvroKeyMapReduceJobOutput.java`). */
  def writeAvro(df: DataFrame, path: String, schemaJson: String): Unit = {
    val spark = df.sparkSession
    deleteDir(spark, path)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    val names = df.columns
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new GenericData.Record(schema)
        names.zipWithIndex.foreach { case (n, i) =>
          val f = schema.getField(n)
          val v = row.get(i)
          val typed: AnyRef = (f.schema().getType, v) match {
            case (_, null) => null
            case (Schema.Type.LONG, x: Number) => java.lang.Long.valueOf(x.longValue)
            case (Schema.Type.INT, x: Number) => java.lang.Integer.valueOf(x.intValue)
            case (Schema.Type.DOUBLE, x: Number) => java.lang.Double.valueOf(x.doubleValue)
            case (Schema.Type.FLOAT, x: Number) => java.lang.Float.valueOf(x.floatValue)
            case (_, x) => String.valueOf(x)
          }
          rec.put(n, typed)
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }
}
