package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.kvstore.{KeyValueStore, TableKeyValueStore}
import graft.operators.Lifecycle
import graft.operators.Lifecycle._
import Num._

/** The four user-operator types routed through the real lifecycle API
  * (setup → N×process → cleanup, stores, counters — SURVEY §2.1/§2.9),
  * each oracle-checked. These exercise the mapPartitions extensibility
  * path; the equivalent declarative plans (q01-q05) remain the fast path.
  */
object LifecycleQueries {
  type Q = (SparkSession, String) => DataFrame

  // ── q27: Gatherer API — emit (nationkey, custkey), distinct-count reduce
  // (the TestGathererReducer distinct-users-per-zip pattern). ─────────────
  object NationGatherer extends Gatherer[Long, Long] {
    override def counterNames: Seq[String] = Seq("rows_gathered")
    def gather(row: Row, emit: (Long, Long) => Unit, ctx: OperatorContext): Unit = {
      ctx.incrementCounter("rows_gathered")
      emit(longAt(row, "c_nationkey"), longAt(row, "c_custkey"))
    }
  }
  val q27_gather_api: Q = (s, d) => {
    import s.implicits._
    val counters = Counters(s, NationGatherer.counterNames)
    runGatherer(Tables.customer(s, d), NationGatherer, counters)
      .toDF("c_nationkey", "c_custkey")
      .groupBy($"c_nationkey")
      .agg(countDistinct($"c_custkey").as("n_cust"))
      .orderBy($"c_nationkey")
  }
  val q27_sql: String =
    """SELECT c_nationkey, count(DISTINCT c_custkey) AS n_cust
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ── q28: Producer API — derive a column per row, merged back
  // (KijiProducer.produce writes to the same row). ────────────────────────
  object PriorityProducer extends Producer {
    def outputColumn: String = "priority_class"
    def outputType: DataType = StringType
    override def counterNames: Seq[String] = Seq("rows_produced")
    def produce(row: Row, ctx: OperatorContext): Option[Any] = {
      ctx.incrementCounter("rows_produced")
      Option(row.getAs[String]("o_orderpriority")).map(_.substring(0, 1))
    }
  }
  val q28_producer_api: Q = (s, d) => {
    import s.implicits._
    val counters = Counters(s, PriorityProducer.counterNames)
    runProducer(Tables.orders(s, d), PriorityProducer, counters)
      .groupBy($"priority_class")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"priority_class")
  }
  val q28_sql: String =
    s"""SELECT substr(o_orderpriority, 1, 1) AS priority_class,
       |  count(*) AS n, ${sqlSum("o_totalprice")} AS total
       |FROM orders GROUP BY 1 ORDER BY priority_class""".stripMargin

  // ── q29: Pivoter API — re-key lineitem cells onto the supplier entity
  // (KijiPivoter.produce emits cells for arbitrary rows). ─────────────────
  object SupplierPivoter extends Pivoter[Long, Double] {
    def pivot(row: Row, emit: CellPut[Long, Double] => Unit, ctx: OperatorContext): Unit =
      emit(CellPut(
        longAt(row, "l_suppkey"), "li", "qty",
        longAt(row, "l_orderkey") * 10L + longAt(row, "l_linenumber"),
        row.getAs[Double]("l_quantity")))
  }
  val q29_pivot_api: Q = (s, d) => {
    import s.implicits._
    runPivoter(Tables.lineitem(s, d), SupplierPivoter, Counters.empty)
      .toDF()
      .groupBy($"entity_id")
      .agg(count(lit(1)).as("n_cells"), dsum($"value").as("total_qty"))
      .orderBy($"entity_id")
  }
  val q29_sql: String =
    s"""SELECT l_suppkey AS entity_id, count(*) AS n_cells,
       |  ${sqlSum("l_quantity")} AS total_qty
       |FROM lineitem GROUP BY l_suppkey ORDER BY entity_id""".stripMargin

  // ── q30: BulkImporter API over the reference's canonical colon-delimited
  // text records ("rowKey:value", TestBulkImportInput.txt): write the lines
  // distributed, re-import them through the lifecycle parser. ─────────────
  object ColonImporter extends BulkImporter[String, Long, String] {
    override def counterNames: Seq[String] = Seq("records_imported")
    def importRecord(rec: String, emit: CellPut[Long, String] => Unit,
                     ctx: OperatorContext): Unit = {
      val i = rec.indexOf(':')
      if (i > 0) {
        ctx.incrementCounter("records_imported")
        emit(CellPut(rec.substring(0, i).toLong, "info", "name", 0L,
          rec.substring(i + 1)))
      }
    }
  }
  val q30_bulkimport_api: Q = (s, d) => {
    import s.implicits._
    val dir = QueryTmp.dir("q30", d)
    Tables.supplier(s, d)
      .select(concat($"s_suppkey".cast(StringType), lit(":"), $"s_name"))
      .write.mode("overwrite").text(dir)
    val lines = s.read.textFile(dir)
    val counters = Counters(s, ColonImporter.counterNames)
    runBulkImporter(lines, ColonImporter, counters)
      .toDF()
      .select($"entity_id", $"value".as("s_name"))
      .orderBy($"entity_id")
  }
  val q30_sql: String =
    """SELECT s_suppkey AS entity_id, s_name
      |FROM supplier ORDER BY entity_id""".stripMargin

  // ── q31: KeyValueStore point-lookup inside a Gatherer (getStore/get —
  // KM/KijiContext.java:53-54), store = another table's projection
  // (KijiTableKeyValueStore). ─────────────────────────────────────────────
  final class SegmentGatherer(store: KeyValueStore[String, String])
      extends Gatherer[String, Double] {
    override def requiredStores: Map[String, KeyValueStore[String, String]] =
      Map("cust" -> store)
    override def counterNames: Seq[String] = Seq("lookups", "misses")
    def gather(row: Row, emit: (String, Double) => Unit,
               ctx: OperatorContext): Unit = {
      ctx.incrementCounter("lookups")
      ctx.getStore("cust").get(row.getAs[Long]("o_custkey").toString) match {
        case Some(seg) => emit(seg, row.getAs[Double]("o_totalprice"))
        case None => ctx.incrementCounter("misses")
      }
    }
  }
  val q31_kvstore_lookup: Q = (s, d) => {
    import s.implicits._
    // Scale path: the store is consumed through a broadcast-hash lookup
    // join (no driver materialization at all); dropping null lookups
    // mirrors the gatherer's skip-on-miss. The point-get reader path
    // (SegmentGatherer above) stays covered by KvStoreSpec on a
    // dim-sized store.
    val store = new TableKeyValueStore(
      Tables.customer(s, d), "c_custkey", "c_mktsegment")
    store.lookupJoin(Tables.orders(s, d), $"o_custkey", as = "c_mktsegment")
      .filter($"c_mktsegment".isNotNull)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"c_mktsegment")
  }
  val q31_sql: String =
    s"""SELECT c_mktsegment, count(*) AS n_orders,
       |  ${sqlSum("o_totalprice")} AS revenue
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, Q] = Map(
    "q27_gather_api" -> q27_gather_api,
    "q28_producer_api" -> q28_producer_api,
    "q29_pivot_api" -> q29_pivot_api,
    "q30_bulkimport_api" -> q30_bulkimport_api,
    "q31_kvstore_lookup" -> q31_kvstore_lookup,
  )
  val oracleSql: Map[String, String] = Map(
    "q27_gather_api" -> q27_sql,
    "q28_producer_api" -> q28_sql,
    "q29_pivot_api" -> q29_sql,
    "q30_bulkimport_api" -> q30_sql,
    "q31_kvstore_lookup" -> q31_sql,
  )
}
