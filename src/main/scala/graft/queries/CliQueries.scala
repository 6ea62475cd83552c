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

  val queries: Map[String, Q] = Map(
    "q46_cli_table_roundtrip" -> q46_cli_table_roundtrip,
  )
  val oracleSql: Map[String, String] = Map(
    "q46_cli_table_roundtrip" -> q46_sql,
  )
}
