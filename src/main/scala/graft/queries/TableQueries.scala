package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.dml.Dml
import graft.table.{DataRequest, EntityTable, FamilySpec, TableLayout}
import Num._

/** The entity-table surface end-to-end: bulk load (staged + atomic commit),
  * DML change-feed merge with HBase tombstone semantics, and versioned
  * reads with max_versions retention — all through the real write path and
  * all oracle-checked.
  */
object TableQueries {
  type Q = (SparkSession, String) => DataFrame

  private def tmpTable(tag: String, d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${tag}_${d.hashCode.toHexString}"

  /** events → long-format cells (user_id, 'ev', event_type, µs, value). */
  private def eventCells(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id").as("entity_id"), lit("ev").as("family"),
      col("event_type").as("qualifier"), unix_micros(col("ts")).as("ts"),
      col("value"))

  // ── q32: bulk-load roundtrip — lineitem cells through the range-
  // partitioned sorted staged write + atomic commit, read back, aggregate ─
  val q32_bulk_roundtrip: Q = (s, d) => {
    import s.implicits._
    val cells = Tables.lineitem(s, d).select(
      $"l_orderkey".as("entity_id"), lit("li").as("family"),
      $"l_linenumber".cast(StringType).as("qualifier"),
      unix_micros($"l_shipdate".cast(TimestampType)).as("ts"),
      $"l_extendedprice".as("value"))
    val table = new EntityTable(s, tmpTable("q32", d),
      TableLayout("lineitem_cells", Seq(FamilySpec("li"))))
    table.bulkLoad(cells, numPartitions = 32)
    table.cells
      .groupBy($"entity_id")
      .agg(count(lit(1)).as("n_cells"), dsum($"value").as("total"))
      .orderBy($"entity_id")
  }
  val q32_sql: String =
    s"""SELECT l_orderkey AS entity_id, count(*) AS n_cells,
       |  ${sqlSum("l_extendedprice")} AS total
       |FROM lineitem GROUP BY l_orderkey ORDER BY entity_id""".stripMargin

  // ── q33: DML — mass deleteColumn tombstones + deleteRow + put merged
  // through the change feed (q16's filter emulation, now via the real
  // delete path with HBase ts<=T masking). ────────────────────────────────
  val q33_dml_tombstones: Q = (s, d) => {
    import s.implicits._
    val cells = eventCells(s, d)
    val cutoff = java.time.Instant.parse("2024-01-15T00:00:00Z")
    val cutoffUs = cutoff.getEpochSecond * 1000000L
    // mass delete: one delete_column('ev','click', upTo=cutoff) per entity
    val clickDeletes = cells.select($"entity_id").distinct().select(
      $"entity_id", lit("ev").as("family"), lit("click").as("qualifier"),
      lit("delete_column").as("op"), lit(cutoffUs).as("ts"),
      lit(null).cast(DoubleType).as("value"))
    val scalarChanges = Seq(
      Dml.deleteRow[java.lang.Double](7L, Long.MaxValue, null),
      Dml.put(3L, "ev", "bonus", 1L, java.lang.Double.valueOf(99.5))
    ).toDF("entity_id", "family", "qualifier", "op", "ts", "value")
      .select($"entity_id", $"family", $"qualifier", $"op", $"ts",
        $"value".cast(DoubleType).as("value"))
    Dml.applyChanges(cells, clickDeletes.unionByName(scalarChanges))
      .groupBy($"qualifier")
      .agg(count(lit(1)).as("n_cells"), dsum($"value").as("sum_value"))
      .orderBy($"qualifier")
  }
  val q33_sql: String =
    s"""WITH survivors AS (
       |  SELECT user_id AS entity_id, event_type AS qualifier, value
       |  FROM events
       |  WHERE NOT (event_type = 'click'
       |             AND epoch_us(ts) <= epoch_us(TIMESTAMP '2024-01-15'))
       |    AND user_id <> 7
       |  UNION ALL SELECT 3, 'bonus', 99.5
       |)
       |SELECT qualifier, count(*) AS n_cells, ${sqlSum("value")} AS sum_value
       |FROM survivors GROUP BY qualifier ORDER BY qualifier""".stripMargin

  // ── q34: versioned read through the table API — bulk load events cells,
  // read back with max_versions=3 retention (locality-group policy). ──────
  val q34_versioned_read: Q = (s, d) => {
    import s.implicits._
    val table = new EntityTable(s, tmpTable("q34", d),
      TableLayout("events_cells", Seq(FamilySpec("ev", maxVersions = 3))))
    table.bulkLoad(eventCells(s, d), numPartitions = 32)
    table.read(DataRequest(maxVersions = 3))
      .select($"entity_id", $"qualifier", explode($"versions").as("v"))
      .groupBy($"entity_id", $"qualifier")
      .agg(count(lit(1)).as("n_kept"), dsum($"v.value").as("sum_kept"))
      .orderBy($"entity_id", $"qualifier")
  }
  val q34_sql: String =
    s"""SELECT user_id AS entity_id, event_type AS qualifier,
       |  count(*) AS n_kept, ${sqlSum("value")} AS sum_kept
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |        ORDER BY ts DESC, value DESC) AS rn FROM events)
       |WHERE rn <= 3 GROUP BY user_id, event_type
       |ORDER BY entity_id, qualifier""".stripMargin

  val queries: Map[String, Q] = Map(
    "q32_bulk_roundtrip" -> q32_bulk_roundtrip,
    "q33_dml_tombstones" -> q33_dml_tombstones,
    "q34_versioned_read" -> q34_versioned_read,
  )
  val oracleSql: Map[String, String] = Map(
    "q32_bulk_roundtrip" -> q32_sql,
    "q33_dml_tombstones" -> q33_sql,
    "q34_versioned_read" -> q34_sql,
  )
}
