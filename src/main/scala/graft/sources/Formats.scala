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

  /** `format=... file=... [key=value ...]` spec parser + dispatch. */
  def read(spark: SparkSession, spec: String): DataFrame = {
    val kv = spec.trim.split("\\s+").map { tok =>
      val i = tok.indexOf('=')
      require(i > 0, s"malformed spec token '$tok' (expected key=value)")
      tok.take(i) -> tok.drop(i + 1)
    }.toMap
    val file = kv.getOrElse("file",
      throw new IllegalArgumentException(s"spec missing file=: '$spec'"))
    kv.getOrElse("format",
      throw new IllegalArgumentException(s"spec missing format=: '$spec'")) match {
      case "text" => readText(spark, file)
      case "csv" => readCsv(spark, file,
        header = kv.getOrElse("header", "true").toBoolean,
        delimiter = kv.getOrElse("delim", ","))
      case "small-text-files" => readWholeFiles(spark, file)
      case "xml" => readXml(spark, file, kv.getOrElse("tag", "row"))
      case "seq" => readSeqFile(spark, file)
      case "avro" => readAvro(spark, file)
      case "avrokv" => readAvroKV(spark, file)
      case other => throw new IllegalArgumentException(s"unknown format '$other'")
    }
  }

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
              delimiter: String = ","): DataFrame =
    spark.read.option("header", header).option("delimiter", delimiter).csv(path)

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

  /** SequenceFile of Text key/values → (key, value) strings. */
  def readSeqFile(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext
      .sequenceFile(path, classOf[Text], classOf[Text])
      .map { case (k, v) => Row(k.toString, v.toString) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("key", StringType), StructField("value", StringType))))
  }

  /** Avro container files via avro-mapred. Fields are surfaced as strings
    * (callers cast); the container's writer schema is read from the file. */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path, classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      new Configuration(spark.sparkContext.hadoopConfiguration))
    // Extract to serializable form inside the reading task: GenericRecord
    // itself is not serializable across the shuffle.
    val fieldsRdd = rdd.mapPartitions { it =>
      it.map { case (k, _) =>
        val r = k.datum()
        val fields = r.getSchema.getFields
        val m = new scala.collection.mutable.LinkedHashMap[String, String]
        fields.forEach(f => m += (f.name -> Option(r.get(f.name)).map(String.valueOf).orNull))
        m.toSeq
      }
    }
    val names = fieldsRdd.take(1).headOption.map(_.map(_._1)).getOrElse(Seq.empty)
    spark.createDataFrame(
      fieldsRdd.map(s => Row(s.map(_._2): _*)),
      StructType(names.map(StructField(_, StringType))))
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
