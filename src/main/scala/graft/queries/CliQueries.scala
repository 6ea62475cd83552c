package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Tool
import graft.operators.Lifecycle._
import graft.table.{EntityTable, LayoutJson}
import Num._

/** Reflectively-instantiated pivoter for the CLI roundtrip: passes each
  * most-recent cell through, re-familied to `out` — the no-arg-constructor
  * operator class shape the reference CLI loads by name
  * (`kiji.pivoter.class`, `KM/tools/KijiPivot.java`). */
final class CliCellPivoter extends Pivoter[Long, String] {
  def pivot(row: Row, emit: CellPut[Long, String] => Unit,
            ctx: OperatorContext): Unit =
    emit(CellPut(longAt(row, "entity_id"), "out",
      row.getAs[String]("qualifier"), longAt(row, "ts"),
      row.getAs[Double]("value").toString))
}

/** The reference CLI's canonical table-to-table shape, end-to-end:
  * `--input="format=kiji table=... layout=..."` →
  * reflectively-loaded operator → `--output="format=hfile table=..."`
  * (`KM/tools/framework/JobInputSpec.java:52-70`, `JobOutputSpec.java:51-65`,
  * `KM/tools/KijiGather.java:38-44`). q46 drives graft.Tool exactly as a
  * user would: stage a source entity table, run a pivot job whose input is
  * a kiji table scan and whose output is an HFile bulk load into a second
  * table, then read the destination back through the same `format=kiji`
  * dispatch.
  */
object CliQueries {
  type Q = (SparkSession, String) => DataFrame

  private val layoutJson: String =
    """{"name": "events_src", "keys_format": {"encoding": "RAW"},
      | "locality_groups": [{"name": "default", "compression_type": "SNAPPY",
      |   "families": [{"name": "ev"}]}]}""".stripMargin

  val q46_cli_table_roundtrip: Q = (s, d) => {
    val srcTable = QueryTmp.dir("q46src", d)
    val dstTable = QueryTmp.dir("q46dst", d)
    val layoutFile = QueryTmp.dir("q46layout", d)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(layoutFile), layoutJson)
    // Stage the source table through the engine's own bulk-load path.
    val cells = Tables.events(s, d).select(
      col("user_id").as("entity_id"), lit("ev").as("family"),
      col("event_type").as("qualifier"), unix_micros(col("ts")).as("ts"),
      col("value"))
    new EntityTable(s, srcTable, LayoutJson.parse(layoutJson))
      .bulkLoad(cells, numPartitions = 32)
    // The CLI job: kiji-table input (most-recent scan) → pivoter → hfile
    // bulk output. One plan execution; the write IS the job action.
    Tool.run(s, Array("pivot",
      "--pivoter=graft.queries.CliCellPivoter",
      s"--input=format=kiji table=$srcTable layout=$layoutFile",
      s"--output=format=hfile table=$dstTable splits=16",
      "--name=q46-cli-roundtrip"))
    // Read the destination back through the same format= dispatch.
    graft.sources.Formats.read(s, s"format=kiji table=$dstTable")
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n_cells"),
        dsum(col("value").cast(DoubleType)).as("total"))
      .orderBy(col("qualifier"))
  }
  /** Most-recent tie-break mirrors mostRecent's max(struct(ts, value)):
    * ORDER BY ts DESC, value DESC. */
  val q46_sql: String =
    s"""WITH mr AS (
       |  SELECT user_id, event_type, value FROM (
       |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |      ORDER BY ts DESC, value DESC) AS rn FROM events)
       |  WHERE rn = 1)
       |SELECT event_type AS qualifier, count(*) AS n_cells,
       |  ${sqlSum("value")} AS total
       |FROM mr GROUP BY event_type ORDER BY qualifier""".stripMargin

  // ── q196: the BUCKETED table lifecycle end-to-end through graft.Tool
  // (the CLI plumbing for q187's rewrite-unit fix — no Scala required):
  // a pivot job bulk-loads the destination in the KEY-BUCKETED layout
  // (`format=hfile ... buckets=16`), a second job direct-writes a price
  // correction (`format=kiji` — on a bucketed table the puts route
  // through the merge-on-read change feed: a root-generation file would
  // be invisible to the bucket-manifest read), the `compact` verb folds
  // the feed (per-bucket generations, one atomic multi-root commit),
  // and the read-back goes through the same `format=kiji` dispatch.
  // Values survive the pivoter's string roundtrip exactly (q46), so the
  // final state hash-matches the oracle's put chain over orders. ────────
  private val ordersLayoutJson: String =
    """{"name": "orders_src", "keys_format": {"encoding": "RAW"},
      | "locality_groups": [{"name": "default", "compression_type": "SNAPPY",
      |   "families": [{"name": "ord"}]}]}""".stripMargin

  val q196_cli_bucketed_fold: Q = (s, d) => {
    val src = QueryTmp.dir("q196src", d)
    val deltaSrc = QueryTmp.dir("q196delta", d)
    val dst = QueryTmp.dir("q196dst", d)
    val layoutFile = QueryTmp.dir("q196layout", d)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(layoutFile), ordersLayoutJson)
    val orders = Tables.orders(s, d)
    def cellsOf(df: DataFrame, ts: Long) = df.select(
      col("o_orderkey").as("entity_id"), lit("ord").as("family"),
      lit("price").as("qualifier"), lit(ts).as("ts"),
      col("value"))
    new EntityTable(s, src, LayoutJson.parse(ordersLayoutJson)).bulkLoad(
      cellsOf(orders.select(col("o_orderkey"),
        col("o_totalprice").as("value")), 0L), numPartitions = 32)
    new EntityTable(s, deltaSrc, LayoutJson.parse(ordersLayoutJson)).bulkLoad(
      cellsOf(orders.filter(col("o_orderkey") % 10 === 3)
        .select(col("o_orderkey"), (col("o_totalprice") * 2).as("value")),
        1L), numPartitions = 32)
    // CLI bucketed bulk-load: xxhash64(entity_id) mod 16 bucket roots
    Tool.run(s, Array("pivot",
      "--pivoter=graft.queries.CliCellPivoter",
      s"--input=format=kiji table=$src layout=$layoutFile",
      s"--output=format=hfile table=$dst splits=16 buckets=16",
      "--name=q196-bucketed-load"))
    // CLI direct write of the correction batch (feed-routed on the
    // bucketed layout), then the compact verb's physical fold
    Tool.run(s, Array("pivot",
      "--pivoter=graft.queries.CliCellPivoter",
      s"--input=format=kiji table=$deltaSrc layout=$layoutFile",
      s"--output=format=kiji table=$dst",
      "--name=q196-correction"))
    Tool.run(s, Array("compact", s"--table=$dst", "--splits=32"))
    graft.sources.Formats.read(s, s"format=kiji table=$dst")
      .groupBy((col("entity_id") % 10).as("kbucket"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value").cast(DoubleType)).as("price_sum"))
      .orderBy(col("kbucket"))
  }
  val q196_sql: String =
    s"""WITH m AS (
       |  SELECT o_orderkey AS entity_id,
       |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
       |         ELSE o_totalprice END AS value
       |  FROM orders)
       |SELECT entity_id % 10 AS kbucket, count(*) AS n,
       |  ${sqlSum("value")} AS price_sum
       |FROM m GROUP BY 1 ORDER BY kbucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "q46_cli_table_roundtrip" -> q46_cli_table_roundtrip,
    "q196_cli_bucketed_fold" -> q196_cli_bucketed_fold,
  )
  val oracleSql: Map[String, String] = Map(
    "q46_cli_table_roundtrip" -> q46_sql,
    "q196_cli_bucketed_fold" -> q196_sql,
  )
}
