package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.sources.Formats
import Num._

/** One oracle-checked import per IO format (SURVEY §2.2/§2.3): each query
  * exports a driver table through the engine's sink for that format, reads
  * it back through the `format=` dispatch, and aggregates — so the oracle
  * (computed from the original parquet) catches any corruption in either
  * direction of the format roundtrip.
  */
object FormatQueries {
  type Q = (SparkSession, String) => DataFrame

  private def tmp(tag: String, d: String): String = QueryTmp.dir(tag, d)

  // ── q35: CSV source through the format= dispatch ────────────────────────
  val q35_csv_import: Q = (s, d) => {
    import s.implicits._
    val dir = tmp("q35", d)
    Tables.customer(s, d)
      .select($"c_custkey", $"c_name", $"c_nationkey", $"c_mktsegment")
      .write.mode("overwrite").option("header", "true").csv(dir)
    Formats.read(s, s"format=csv file=$dir header=true")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"c_custkey".cast(LongType)).as("key_sum"))
      .orderBy($"c_mktsegment")
  }
  val q35_sql: String =
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ── q87: JSON-lines source through the format= dispatch — the
  // interchange format crawl/curation pipelines emit. The read passes an
  // EXPLICIT schema (schema= spec key): at 100 TB, Spark's schema
  // inference is a full extra dataset scan, so the production path must
  // skip it — and the explicit schema also pins column types against
  // inference drift (a doc_id that happens to scan as INT on one shard).
  // Roundtrip: documents → .json() writer → format=json reader → agg. ────
  val q87_json_import: Q = (s, d) => {
    import s.implicits._
    val dir = tmp("q87", d)
    Tables.documents(s, d)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .write.mode("overwrite").json(dir)
    Formats.read(s,
        s"format=json file=$dir schema=doc_id:BIGINT,lang:STRING,source:STRING,n_chars:BIGINT")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum($"n_chars").as("chars_sum"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
      .orderBy($"lang")
  }
  val q87_sql: String =
    """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars_sum,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ── q36: XML tag-delimited records (kiji.input.xml.record.tag analog) ──
  val q36_xml_import: Q = (s, d) => {
    import s.implicits._
    val dir = tmp("q36", d)
    Tables.orders(s, d).select(concat(
      lit("<order><key>"), $"o_orderkey",
      lit("</key><status>"), $"o_orderstatus",
      lit("</status><price>"), $"o_totalprice".cast(StringType),
      lit("</price></order>")).as("value"))
      .write.mode("overwrite").text(dir)
    Formats.read(s, s"format=xml file=$dir tag=order")
      .select(
        regexp_extract($"record", "<status>(.*?)</status>", 1).as("o_orderstatus"),
        regexp_extract($"record", "<price>(.*?)</price>", 1)
          .cast(DoubleType).as("price"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum($"price").as("total"))
      .orderBy($"o_orderstatus")
  }
  val q36_sql: String =
    s"""SELECT o_orderstatus, count(*) AS n,
       |  ${sqlSum("o_totalprice")} AS total
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ── q37: whole-small-files source (one record per file) ─────────────────
  val q37_wholefile_import: Q = (s, d) => {
    import s.implicits._
    val dir = tmp("q37", d)
    Tables.supplier(s, d)
      .select($"s_nationkey", concat($"s_suppkey", lit("|"), $"s_name").as("line"))
      .repartition(1)
      .write.mode("overwrite").partitionBy("s_nationkey").text(dir)
    Formats.read(s, s"format=small-text-files file=$dir/s_nationkey=*")
      .select(
        regexp_extract($"path", "s_nationkey=(\\d+)", 1).cast(IntegerType)
          .as("s_nationkey"),
        size(filter(split($"content".cast(StringType), "\n"),
          l => length(l) > 0)).as("n_lines"))
      .groupBy($"s_nationkey")
      .agg(sum($"n_lines").as("n_suppliers"))
      .orderBy($"s_nationkey")
  }
  val q37_sql: String =
    """SELECT s_nationkey, count(*) AS n_suppliers
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // ── q38: SequenceFile + Avro container roundtrips ───────────────────────
  val q38_seq_avro_import: Q = (s, d) => {
    import s.implicits._
    val seqDir = tmp("q38seq", d)
    val avroDir = tmp("q38avro", d)
    val part = Tables.part(s, d)
    Formats.writeSeqFile(
      part.select($"p_partkey".cast(StringType), $"p_name"), seqDir)
    Formats.writeAvro(
      part.select($"p_partkey", $"p_retailprice"), avroDir,
      """{"type":"record","name":"P","fields":[
        |{"name":"p_partkey","type":"long"},
        |{"name":"p_retailprice","type":"double"}]}""".stripMargin)
    val fromSeq = Formats.read(s, s"format=seq file=$seqDir")
      .select($"key".cast(LongType).as("p_partkey"), $"value".as("p_name"))
    val fromAvro = Formats.read(s, s"format=avro file=$avroDir")
      .select($"p_partkey".cast(LongType).as("p_partkey"),
        $"p_retailprice".cast(DoubleType).as("p_retailprice"))
    fromSeq.join(fromAvro, "p_partkey")
      .agg(count(lit(1)).as("n"),
        sum(length($"p_name")).as("name_chars"),
        dsum($"p_retailprice").as("price_sum"))
      .select(lit(1).as("one"), $"n", $"name_chars", $"price_sum")
  }
  val q38_sql: String =
    s"""SELECT 1 AS one, count(*) AS n,
       |  CAST(sum(length(p_name)) AS BIGINT) AS name_chars,
       |  ${sqlSum("p_retailprice")} AS price_sum
       |FROM part""".stripMargin

  // ── q47: Avro-valued SequenceFile roundtrip — record values, schemas
  // embedded in the file metadata, decoded back through the header-sniffed
  // `format=seq` dispatch (AvroSequenceFileInputFormat analog). ───────────
  val q47_avroseq_import: Q = (s, d) => {
    import s.implicits._
    val dir = tmp("q47", d)
    Formats.writeAvroSeqFile(
      Tables.part(s, d)
        .select($"p_partkey", struct($"p_name", $"p_retailprice").as("v")),
      dir,
      "\"long\"",
      """{"type":"record","name":"PV","fields":[
        |{"name":"p_name","type":"string"},
        |{"name":"p_retailprice","type":"double"}]}""".stripMargin)
    Formats.read(s, s"format=seq file=$dir")
      .select($"key".as("p_partkey"), $"value.p_name".as("p_name"),
        $"value.p_retailprice".as("p_retailprice"))
      .groupBy(($"p_partkey" % 10L).as("key_mod"))
      .agg(count(lit(1)).as("n"), sum(length($"p_name")).as("name_chars"),
        dsum($"p_retailprice").as("price_sum"))
      .orderBy($"key_mod")
  }
  val q47_sql: String =
    s"""SELECT p_partkey % 10 AS key_mod, count(*) AS n,
       |  CAST(sum(length(p_name)) AS BIGINT) AS name_chars,
       |  ${sqlSum("p_retailprice")} AS price_sum
       |FROM part GROUP BY 1 ORDER BY key_mod""".stripMargin

  val queries: Map[String, Q] = Map(
    "q35_csv_import" -> q35_csv_import,
    "q36_xml_import" -> q36_xml_import,
    "q37_wholefile_import" -> q37_wholefile_import,
    "q38_seq_avro_import" -> q38_seq_avro_import,
    "q47_avroseq_import" -> q47_avroseq_import,
    "q87_json_import" -> q87_json_import,
  )
  val oracleSql: Map[String, String] = Map(
    "q35_csv_import" -> q35_sql,
    "q36_xml_import" -> q36_sql,
    "q37_wholefile_import" -> q37_sql,
    "q38_seq_avro_import" -> q38_sql,
    "q47_avroseq_import" -> q47_sql,
    "q87_json_import" -> q87_sql,
  )
}
