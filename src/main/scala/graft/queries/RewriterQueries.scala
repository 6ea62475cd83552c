package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.CellRewriter

/** Record-schema-evolution rewrite (`KM/pivot/KijiCellRewriter.java`,
  * `cell-rewriter.avdl`): a cell table carrying THREE writer generations of
  * a record schema is migrated to the latest generation through chained
  * rules resolved to fixpoint, then aggregated — so the oracle catches a
  * missed or mis-ordered migration step for any generation.
  *
  * All derived money fields use exact decimal arithmetic (not double) so
  * Spark and DuckDB agree bit-for-bit regardless of evaluation order.
  */
object RewriterQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Price = DecimalType(18, 2)
  private val Tax = DecimalType(23, 4)   // (18,2) * (4,2) in Spark's rules
  private val Total = DecimalType(24, 4) // (18,2) + (23,4)

  private def rate(r: String): Column = lit(r).cast(DecimalType(4, 2))

  // Generations of the "order summary" record:
  //   v1: {status, price}                        (tax era not yet begun)
  //   v2: {state, price, tax}  status→state rename; writers used tax=8%
  //   v3: {state, price, tax, total}             writers used tax=10%
  // Migration rules: 1→2 fills state from status and back-computes tax at
  // the v1-era 5% rate; 2→3 adds total = price + tax. A v1 cell therefore
  // chains 1→2→3 in one pass.
  val q43_schema_evolution: Q = (s, d) => {
    import s.implicits._
    val nullS = lit(null).cast(StringType)
    val nullTax = lit(null).cast(Tax)
    val nullTotal = lit(null).cast(Total)
    val price = $"o_totalprice".cast(Price)
    // Multi-generation cells: superset struct (parquet schema-merge shape),
    // generation = o_orderkey % 3 + 1, fields absent in a generation null.
    val cells = Tables.orders(s, d).select(
      ($"o_orderkey" % 3 + 1).cast(IntegerType).as("v"),
      when($"o_orderkey" % 3 === 0, // v1
        struct($"o_orderstatus".as("status"), nullS.as("state"),
          price.as("price"), nullTax.as("tax"), nullTotal.as("total")))
      .when($"o_orderkey" % 3 === 1, // v2
        struct(nullS.as("status"), $"o_orderstatus".as("state"),
          price.as("price"), (price * rate("0.08")).cast(Tax).as("tax"),
          nullTotal.as("total")))
      .otherwise( // v3
        struct(nullS.as("status"), $"o_orderstatus".as("state"),
          price.as("price"), (price * rate("0.10")).cast(Tax).as("tax"),
          (price + price * rate("0.10")).cast(Total).as("total")))
      .as("value"))
    val rules = Seq(
      CellRewriter.RecordRule(1, 2, c =>
        c.withField("state", c.getField("status"))
         .withField("status", nullS)
         .withField("tax", (c.getField("price") * rate("0.05")).cast(Tax))),
      CellRewriter.RecordRule(2, 3, c =>
        c.withField("total",
          (c.getField("price") + c.getField("tax")).cast(Total))))
    val migrated = CellRewriter.rewriteRecords(cells, "v", "value", rules)
    migrated
      .groupBy($"value.state".as("state"))
      .agg(count(lit(1)).as("n"),
        min($"v").as("v_min"), max($"v").as("v_max"),
        sum($"value.total".cast(DecimalType(38, 4))).cast(DoubleType).as("total_sum"))
      .orderBy($"state")
  }
  val q43_sql: String =
    """WITH final AS (
      |  SELECT o_orderstatus AS state, 3 AS v,
      |    CAST(o_totalprice AS DECIMAL(18,2))
      |      + CAST(o_totalprice AS DECIMAL(18,2)) * (CASE o_orderkey % 3
      |          WHEN 0 THEN CAST('0.05' AS DECIMAL(4,2))
      |          WHEN 1 THEN CAST('0.08' AS DECIMAL(4,2))
      |          ELSE        CAST('0.10' AS DECIMAL(4,2)) END) AS total
      |  FROM orders)
      |SELECT state, count(*) AS n, min(v) AS v_min, max(v) AS v_max,
      |  CAST(sum(CAST(total AS DECIMAL(38,4))) AS DOUBLE) AS total_sum
      |FROM final GROUP BY state ORDER BY state""".stripMargin

  val queries: Map[String, Q] = Map(
    "q43_schema_evolution" -> q43_schema_evolution)
  val oracleSql: Map[String, String] = Map(
    "q43_schema_evolution" -> q43_sql)
}
