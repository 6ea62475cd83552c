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

  private def tmpTable(tag: String, d: String): String = QueryTmp.dir(tag, d)

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
      Dml.deleteRow[Long, java.lang.Double](7L, Long.MaxValue, null),
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

  // ── q74: map-type family WIDE-ROW view (readWide) — the reference's
  // KijiRowData map-family access (one row per entity, qualifiers as map
  // keys). The wide map column itself has no stable cross-engine hash,
  // so the query flattens it back out (map_keys/explode) and profiles
  // each entity row: qualifier count, version count across the map, and
  // the newest value per qualifier — each derived THROUGH the map view,
  // so the grouping, sort_array ordering and per-qualifier version
  // retention are all on the verified path. ───────────────────────────────
  val q74_wide_row: Q = (s, d) => {
    import s.implicits._
    val table = new EntityTable(s, tmpTable("q74", d),
      TableLayout("events_cells", Seq(FamilySpec("ev", maxVersions = 2))))
    table.bulkLoad(eventCells(s, d), numPartitions = 32)
    table.readWide(DataRequest(maxVersions = 2))
      .select($"entity_id", explode($"cells").as(Seq("qualifier", "versions")))
      .select($"entity_id", $"qualifier",
        size($"versions").cast(org.apache.spark.sql.types.LongType).as("n_versions"),
        $"versions"(0)("value").as("newest_value"))
      .groupBy($"entity_id")
      .agg(count(lit(1)).as("n_qualifiers"),
        sum($"n_versions").as("n_cells"),
        dsum($"newest_value", 6).as("sum_newest"))
      .orderBy($"entity_id")
  }
  val q74_sql: String =
    s"""WITH kept AS (
       |  SELECT user_id, event_type, value,
       |    row_number() OVER (PARTITION BY user_id, event_type
       |      ORDER BY ts DESC, value DESC) AS rn
       |  FROM events)
       |SELECT user_id AS entity_id,
       |  count(DISTINCT event_type) AS n_qualifiers,
       |  count(*) AS n_cells,
       |  ${Num.sqlSum("CASE WHEN rn = 1 THEN value ELSE 0 END", 6)} AS sum_newest
       |FROM kept WHERE rn <= 2
       |GROUP BY user_id ORDER BY entity_id""".stripMargin

  // ── q75: direct (live) table writes — the DirectKijiTableWriterContext
  // path: three interleaved put batches appended as live parquet files
  // (readers resolve newest-ts-wins at read time), then a compaction back
  // to bulk order, then a most-recent read. Exercises the unsorted-append
  // → compact → range-ordered lifecycle end-to-end on the verified path. ──
  val q75_direct_write: Q = (s, d) => {
    import s.implicits._
    val path = tmpTable("q75", d)
    val cells = eventCells(s, d)
    Seq(0, 1, 2).foreach { i =>
      graft.sinks.DirectSink.append(cells.filter($"entity_id" % 3 === i), path)
    }
    graft.sinks.DirectSink.compact(s, path)
    val table = new EntityTable(s, path,
      TableLayout("events_cells", Seq(FamilySpec("ev"))))
    table.mostRecent()
      .groupBy($"qualifier")
      .agg(count(lit(1)).as("n_cells"), dsum($"value", 6).as("sum_newest"))
      .orderBy($"qualifier")
  }
  val q75_sql: String =
    s"""SELECT event_type AS qualifier, count(*) AS n_cells,
       |  ${Num.sqlSum("value", 6)} AS sum_newest
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |        ORDER BY ts DESC, value DESC) AS rn FROM events)
       |WHERE rn = 1 GROUP BY event_type ORDER BY qualifier""".stripMargin

  // ── q41: composite entity IDs, HASH_PREFIX encoding — the salted
  // multi-component row key of the reference layout (test.json:22
  // hash_prefix MD5). Bulk load range-partitions on the SALTED key, so
  // monotonically increasing orderkeys spread evenly instead of hammering
  // one region; components decode back out of the stored key. ────────────
  val q41_composite_key: Q = (s, d) => {
    import s.implicits._
    import graft.table.EntityId
    val enc = EntityId.HashPrefix(4)
    val comps = Seq(EntityId.intComp($"l_orderkey"), EntityId.intComp($"l_linenumber"))
    val cells = Tables.lineitem(s, d).select(
      EntityId.encode(enc, comps).as("entity_id"),
      lit("li").as("family"), lit("price").as("qualifier"),
      unix_micros($"l_shipdate".cast(TimestampType)).as("ts"),
      $"l_extendedprice".as("value"))
    val table = new EntityTable(s, tmpTable("q41", d),
      TableLayout("li_salted", Seq(FamilySpec("li"))))
    table.bulkLoad(cells, numPartitions = 32)
    table.cells
      .select(
        EntityId.longComponent(enc, $"entity_id", 0).as("o_key"),
        EntityId.longComponent(enc, $"entity_id", 1).as("line_no"),
        substring($"entity_id", 1, 4).as("salt"),
        $"value")
      .filter($"o_key" >= 1000L && $"o_key" < 3000L)
      .groupBy($"line_no")
      .agg(count(lit(1)).as("n"), dsum($"value").as("price_sum"),
        countDistinct($"salt").as("n_salts"))
      .orderBy($"line_no")
  }
  val q41_sql: String = {
    import graft.table.EntityId
    val saltedKey = EntityId.encodeSql(EntityId.HashPrefix(4),
      Seq(("l_orderkey", true), ("l_linenumber", true)))
    s"""SELECT l_linenumber AS line_no, count(*) AS n,
       |  ${sqlSum("l_extendedprice")} AS price_sum,
       |  count(DISTINCT substr($saltedKey, 1, 4)) AS n_salts
       |FROM lineitem
       |WHERE l_orderkey >= 1000 AND l_orderkey < 3000
       |GROUP BY l_linenumber ORDER BY line_no""".stripMargin
  }

  // ── q42: FORMATTED composite key + row-key RANGE scan. Zero-padded
  // integral components make string order == numeric order, so the range
  // predicate is a plain string comparison on the sorted, range-partitioned
  // table — it reaches the parquet scan as a pushed filter and prunes
  // whole files by min/max stats (the region-pruned scan of the
  // reference's KijiTableInputFormat start/limit row keys). ──────────────
  val q42_formatted_range: Q = (s, d) => {
    import s.implicits._
    import graft.table.EntityId
    val comps = Seq(EntityId.intComp($"l_orderkey"), EntityId.intComp($"l_linenumber"))
    val cells = Tables.lineitem(s, d).select(
      EntityId.encode(EntityId.Formatted, comps).as("entity_id"),
      lit("li").as("family"), lit("price").as("qualifier"),
      unix_micros($"l_shipdate".cast(TimestampType)).as("ts"),
      $"l_extendedprice".as("value"))
    val table = new EntityTable(s, tmpTable("q42", d),
      TableLayout("li_formatted", Seq(FamilySpec("li"))))
    table.bulkLoad(cells, numPartitions = 32)
    table.cells
      .filter(EntityId.formattedRange($"entity_id", 5000L, 20000L))
      .select(
        EntityId.longComponent(EntityId.Formatted, $"entity_id", 0).as("o_key"),
        $"value")
      .groupBy((($"o_key" / 1000L).cast(LongType)).as("okey_kbucket"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("price_sum"))
      .orderBy($"okey_kbucket")
  }
  val q42_sql: String =
    s"""SELECT CAST(floor(l_orderkey / 1000.0) AS BIGINT) AS okey_kbucket,
       |  count(*) AS n, ${sqlSum("l_extendedprice")} AS price_sum
       |FROM lineitem
       |WHERE l_orderkey >= 5000 AND l_orderkey < 20000
       |GROUP BY 1 ORDER BY okey_kbucket""".stripMargin

  // ── q44: locality-group-aware bulk output — two families in different
  // locality groups (different compression codecs), one bulk load writing
  // one file set per group, read back PER GROUP (partition-pruned scans
  // that touch only that group's files — `KijiHFileOutputFormat.java:
  // 122-186`'s per-group HFile dirs). ─────────────────────────────────────
  val q44_locality_groups: Q = (s, d) => {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val hotCells = orders.select(
      $"o_orderkey".as("entity_id"), lit("ord").as("family"),
      lit("price").as("qualifier"), lit(0L).as("ts"),
      $"o_totalprice".as("value"))
    val coldCells = orders.select(
      $"o_orderkey".as("entity_id"), lit("meta").as("family"),
      lit("cust").as("qualifier"), lit(0L).as("ts"),
      $"o_custkey".cast(DoubleType).as("value"))
    val layout = TableLayout("orders_lg", Seq(
      FamilySpec("ord", localityGroup = "hot", compression = "snappy"),
      FamilySpec("meta", localityGroup = "cold", compression = "gzip")))
    val table = new EntityTable(s, tmpTable("q44", d), layout)
    table.bulkLoad(hotCells.unionByName(coldCells), numPartitions = 16)
    val hot = table.localityGroupCells("hot")
      .agg(count(lit(1)).as("n_cells"), dsum($"value").as("sum_value"))
      .select(lit("hot").as("lg"), $"n_cells", $"sum_value")
    val cold = table.localityGroupCells("cold")
      .agg(count(lit(1)).as("n_cells"), dsum($"value").as("sum_value"))
      .select(lit("cold").as("lg"), $"n_cells", $"sum_value")
    cold.unionByName(hot).orderBy($"lg")
  }
  val q44_sql: String =
    s"""SELECT 'cold' AS lg, count(*) AS n_cells,
       |  ${sqlSum("o_custkey")} AS sum_value FROM orders
       |UNION ALL
       |SELECT 'hot' AS lg, count(*) AS n_cells,
       |  ${sqlSum("o_totalprice")} AS sum_value FROM orders
       |ORDER BY lg""".stripMargin

  // ── q48: per-column reader-schema override (ColumnReaderSpec analog) —
  // two writer generations of a stringly-encoded record in two columns,
  // decoded AT READ TIME into one reader struct by DataRequest.readerSpecs
  // (the read-time half of schema evolution; q43 is the rewrite-time
  // half). Exact decimal arithmetic end-to-end so both engines agree. ────
  val q48_reader_schema: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.Column
    val P = DecimalType(18, 2)
    val T = DecimalType(23, 4) // (18,2) * (4,2) in Spark's multiply rules
    val orders = Tables.orders(s, d)
    val price = $"o_totalprice".cast(P)
    // v1 writers stored just the price; v2 writers "price|tax" — staged in
    // ONE pass over orders (a branch per row, not a scan per generation).
    val isV1 = $"o_orderkey" % 2 === 0
    val cells = orders.select(
      $"o_orderkey".as("entity_id"), lit("ord").as("family"),
      when(isV1, "v1").otherwise("v2").as("qualifier"), lit(0L).as("ts"),
      when(isV1, price.cast(StringType))
        .otherwise(concat(price.cast(StringType), lit("|"),
          (price * lit("0.08").cast(DecimalType(4, 2))).cast(T)
            .cast(StringType))).as("value"))
    val table = new EntityTable(s, tmpTable("q48", d),
      TableLayout("orders_readerspec", Seq(FamilySpec("ord"))))
    table.bulkLoad(cells, numPartitions = 32)
    val v1Spec: Column => Column = v => struct(
      v.cast(P).as("price"), lit(null).cast(T).as("tax"))
    val v2Spec: Column => Column = v => struct(
      split(v, "\\|").getItem(0).cast(P).as("price"),
      split(v, "\\|").getItem(1).cast(T).as("tax"))
    table.mostRecent(DataRequest(readerSpecs = Map(
        ("ord", "v1") -> v1Spec, ("ord", "v2") -> v2Spec)))
      .groupBy($"qualifier")
      .agg(count(lit(1)).as("n"),
        sum($"value.price".cast(DecimalType(38, 2))).cast(DoubleType).as("price_sum"),
        sum($"value.tax".cast(DecimalType(38, 4))).cast(DoubleType).as("tax_sum"))
      .orderBy($"qualifier")
  }
  val q48_sql: String =
    """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'v1' ELSE 'v2' END AS qualifier,
      |  count(*) AS n,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,2)))
      |    AS DOUBLE) AS price_sum,
      |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN NULL
      |    ELSE CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
      |      * CAST('0.08' AS DECIMAL(4,2)) AS DECIMAL(23,4)) AS DECIMAL(38,4))
      |    END) AS DOUBLE) AS tax_sum
      |FROM orders GROUP BY 1 ORDER BY qualifier""".stripMargin

  // ── q50: INCREMENTAL DML — the merge-on-read change feed. Bulk-load
  // orders cells once, then append an O(delta) change batch (price-
  // correction puts + row tombstones) WITHOUT rewriting the table
  // (`EntityTable.appendChanges` — the append touches no base file; the
  // no-rewrite invariant itself is asserted in TableDmlSpec), and read
  // back through the merged view. The tombstones carry upTo ts=0, so they
  // mask the base cells but NOT the same-batch correction puts at ts=1 —
  // pure (key, timestamp) resolution, arrival order irrelevant, exactly
  // the reference's buffered put+delete writer semantics
  // (`KM/impl/DirectKijiTableWriterContext.java:46-180`). ────────────────
  val q50_incremental_dml: Q = (s, d) => {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val cells = orders.select(
      $"o_orderkey".as("entity_id"), lit("ord").as("family"),
      lit("price").as("qualifier"), lit(0L).as("ts"),
      $"o_totalprice".as("value"))
    val table = new EntityTable(s, tmpTable("q50", d),
      TableLayout("orders_mor", Seq(FamilySpec("ord"))))
    table.bulkLoad(cells, numPartitions = 32)
    // doubling a double is exact (exponent bump), so both engines see
    // bit-identical corrected prices — no new rounding surface.
    val puts = orders.filter($"o_orderkey" % 10 === 3).select(
      $"o_orderkey".as("entity_id"), lit("ord").as("family"),
      lit("price").as("qualifier"), lit("put").as("op"), lit(1L).as("ts"),
      ($"o_totalprice" * 2).as("value"))
    val tombs = orders.filter($"o_orderkey" % 7 === 0).select(
      $"o_orderkey".as("entity_id"), lit(null).cast(StringType).as("family"),
      lit(null).cast(StringType).as("qualifier"),
      lit("delete_row").as("op"), lit(0L).as("ts"),
      lit(null).cast(DoubleType).as("value"))
    table.appendChanges(puts.unionByName(tombs))
    table.mostRecent()
      .groupBy(($"entity_id" % 10).as("kbucket"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("price_sum"))
      .orderBy($"kbucket")
  }
  val q50_sql: String =
    s"""WITH merged AS (
       |  SELECT o_orderkey AS entity_id,
       |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
       |         ELSE o_totalprice END AS value
       |  FROM orders
       |  WHERE o_orderkey % 10 = 3 OR o_orderkey % 7 <> 0
       |)
       |SELECT entity_id % 10 AS kbucket, count(*) AS n,
       |  ${sqlSum("value")} AS price_sum
       |FROM merged GROUP BY 1 ORDER BY kbucket""".stripMargin

  // ── q52: MINOR COMPACTION — the feed-hygiene half of the LSM lifecycle.
  // Three separate O(delta) append batches (correction puts at ts=1, row
  // tombstones upTo ts=1, late puts at ts=2) leave three feed files;
  // `compactFeed()` folds them into ONE file WITHOUT touching the base or
  // changing the merged view — tombstones survive the fold (they must keep
  // masking base cells until a major compaction). The read back through
  // the folded feed is oracle-checked, and the fold itself is observable:
  // `feed_files` carries the post-fold file count (1) into the hashed
  // result. The ts=2 late puts prove fold-preserved (key, ts) resolution:
  // they outlive the upTo=1 tombstones even for row-deleted entities. ─────
  val q52_minor_compaction: Q = (s, d) => {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val cells = orders.select(
      $"o_orderkey".as("entity_id"), lit("ord").as("family"),
      lit("price").as("qualifier"), lit(0L).as("ts"),
      $"o_totalprice".as("value"))
    val table = new EntityTable(s, tmpTable("q52", d),
      TableLayout("orders_minor", Seq(FamilySpec("ord"))))
    table.bulkLoad(cells, numPartitions = 32)
    // ×2 / ×4 are exponent bumps: exact in double on both engines.
    def put(filterMod: Long, ts: Long, factor: Int) =
      orders.filter($"o_orderkey" % 10 === filterMod).select(
        $"o_orderkey".as("entity_id"), lit("ord").as("family"),
        lit("price").as("qualifier"), lit("put").as("op"), lit(ts).as("ts"),
        ($"o_totalprice" * factor).as("value"))
    table.appendChanges(put(3L, 1L, 2))
    table.appendChanges(orders.filter($"o_orderkey" % 7 === 0).select(
      $"o_orderkey".as("entity_id"), lit(null).cast(StringType).as("family"),
      lit(null).cast(StringType).as("qualifier"),
      lit("delete_row").as("op"), lit(1L).as("ts"),
      lit(null).cast(DoubleType).as("value")))
    table.appendChanges(put(6L, 2L, 4))
    table.compactFeed()
    val feedFilesAfter = table.changeFeedStats._1
    table.mostRecent()
      .groupBy(($"entity_id" % 10).as("kbucket"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("price_sum"))
      .withColumn("feed_files", lit(feedFilesAfter))
      .orderBy($"kbucket")
  }
  val q52_sql: String =
    s"""WITH merged AS (
       |  SELECT o_orderkey AS entity_id,
       |    CASE WHEN o_orderkey % 10 = 6 THEN o_totalprice * 4
       |         WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
       |         ELSE o_totalprice END AS value
       |  FROM orders
       |  WHERE o_orderkey % 7 <> 0 OR o_orderkey % 10 = 6
       |)
       |SELECT entity_id % 10 AS kbucket, count(*) AS n,
       |  ${sqlSum("value")} AS price_sum, CAST(1 AS INT) AS feed_files
       |FROM merged GROUP BY 1 ORDER BY kbucket""".stripMargin

  // ── q133: SNAPSHOT-AS-OF READ (time travel) — q52's three-batch DML
  // history read back at TWO different feed cuts in one result.
  // `EntityTable.mostRecentAsOf(feedTs)` folds only feed entries with
  // ts <= feedTs into the base (one pushed-down filter on the delta-sized
  // feed; base files untouched — cost identical to the live read):
  //   cut 1: the ts=1 correction puts and the upTo=1 row tombstones are
  //     visible, the ts=2 late puts are NOT — tombstoned rows are simply
  //     gone;
  //   cut 2: the ts=2 puts appear, resurrecting the %10==6 slice of the
  //     tombstoned rows (late put > upTo mask) — the full live view.
  // The rollback/debug read the reference's withTimeRange
  // (KM/impl/HFileWriterContext.java:333-339) hints at but never composes
  // with DML; the oracle replays both cuts' (key, ts) resolution
  // relationally. ─────────────────────────────────────────────────────────
  val q133_read_asof: Q = (s, d) => {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val cells = orders.select(
      $"o_orderkey".as("entity_id"), lit("ord").as("family"),
      lit("price").as("qualifier"), lit(0L).as("ts"),
      $"o_totalprice".as("value"))
    val table = new EntityTable(s, tmpTable("q133", d),
      TableLayout("orders_asof", Seq(FamilySpec("ord"))))
    table.bulkLoad(cells, numPartitions = 32)
    // ×2 / ×4 are exponent bumps: exact in double on both engines.
    def put(filterMod: Long, ts: Long, factor: Int) =
      orders.filter($"o_orderkey" % 10 === filterMod).select(
        $"o_orderkey".as("entity_id"), lit("ord").as("family"),
        lit("price").as("qualifier"), lit("put").as("op"), lit(ts).as("ts"),
        ($"o_totalprice" * factor).as("value"))
    table.appendChanges(put(3L, 1L, 2))
    table.appendChanges(orders.filter($"o_orderkey" % 7 === 0).select(
      $"o_orderkey".as("entity_id"), lit(null).cast(StringType).as("family"),
      lit(null).cast(StringType).as("qualifier"),
      lit("delete_row").as("op"), lit(1L).as("ts"),
      lit(null).cast(DoubleType).as("value")))
    table.appendChanges(put(6L, 2L, 4))
    def cut(feedTs: Long) = table.mostRecentAsOf(feedTs)
      .groupBy(($"entity_id" % 10).as("kbucket"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("price_sum"))
      .withColumn("cut", lit(feedTs))
    cut(1L).unionByName(cut(2L)).orderBy($"cut", $"kbucket")
  }
  val q133_sql: String =
    s"""WITH m1 AS (
       |  SELECT o_orderkey AS entity_id,
       |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
       |         ELSE o_totalprice END AS value
       |  FROM orders WHERE o_orderkey % 7 <> 0
       |), m2 AS (
       |  SELECT o_orderkey AS entity_id,
       |    CASE WHEN o_orderkey % 10 = 6 THEN o_totalprice * 4
       |         WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
       |         ELSE o_totalprice END AS value
       |  FROM orders
       |  WHERE o_orderkey % 7 <> 0 OR o_orderkey % 10 = 6
       |), a1 AS (
       |  SELECT entity_id % 10 AS kbucket, count(*) AS n,
       |    ${sqlSum("value")} AS price_sum, CAST(1 AS BIGINT) AS cut
       |  FROM m1 GROUP BY 1
       |), a2 AS (
       |  SELECT entity_id % 10 AS kbucket, count(*) AS n,
       |    ${sqlSum("value")} AS price_sum, CAST(2 AS BIGINT) AS cut
       |  FROM m2 GROUP BY 1)
       |SELECT kbucket, n, price_sum, cut FROM (
       |  SELECT * FROM a1 UNION ALL SELECT * FROM a2)
       |ORDER BY cut, kbucket""".stripMargin

  // ── q134: AS-OF READS ACROSS THE COMPACTION LIFECYCLE — q133's cuts
  // replayed around both compaction kinds, pinning the history contract:
  //   phase 1: cut at ts=1 with the raw three-batch feed;
  //   phase 2: the SAME cut after `compactFeed()` (minor) — the fold
  //     rewrites feed files, not rows, so the snapshot reproduces
  //     bit-for-bit (phases 1 and 2 hash identical rows);
  //   phase 3: cut at ts=2 (== live) after `majorCompact()` — cuts at or
  //     above the fold's high-water ts still reproduce, because every
  //     folded entry is <= watermark <= cut;
  //   refusal: a cut BELOW the watermark (ts=1 again) now throws — the
  //     fold physically discarded the masked versions and tombstones, so
  //     that snapshot is unreproducible and the engine REFUSES rather
  //     than silently serving the post-compaction state (HBase's
  //     versions-dropped-at-major-compaction, made loud). The caught
  //     refusal rides into the hashed result as a column.
  // Each phase is collected eagerly: the compaction that follows it swaps
  // the very files its lazy plan captured (10-row driver state, bounded).
  val q134_asof_compaction: Q = (s, d) => {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val cells = orders.select(
      $"o_orderkey".as("entity_id"), lit("ord").as("family"),
      lit("price").as("qualifier"), lit(0L).as("ts"),
      $"o_totalprice".as("value"))
    val table = new EntityTable(s, tmpTable("q134", d),
      TableLayout("orders_asof_compact", Seq(FamilySpec("ord"))))
    table.bulkLoad(cells, numPartitions = 32)
    // ×2 / ×4 are exponent bumps: exact in double on both engines.
    def put(filterMod: Long, ts: Long, factor: Int) =
      orders.filter($"o_orderkey" % 10 === filterMod).select(
        $"o_orderkey".as("entity_id"), lit("ord").as("family"),
        lit("price").as("qualifier"), lit("put").as("op"), lit(ts).as("ts"),
        ($"o_totalprice" * factor).as("value"))
    table.appendChanges(put(3L, 1L, 2))
    table.appendChanges(orders.filter($"o_orderkey" % 7 === 0).select(
      $"o_orderkey".as("entity_id"), lit(null).cast(StringType).as("family"),
      lit(null).cast(StringType).as("qualifier"),
      lit("delete_row").as("op"), lit(1L).as("ts"),
      lit(null).cast(DoubleType).as("value")))
    table.appendChanges(put(6L, 2L, 4))
    def snap(phase: String, feedTs: Long): DataFrame = {
      val agg = table.mostRecentAsOf(feedTs)
        .groupBy(($"entity_id" % 10).as("kbucket"))
        .agg(count(lit(1)).as("n"), dsum($"value").as("price_sum"))
        .withColumn("phase", lit(phase))
      s.createDataFrame(agg.collectAsList(), agg.schema)
    }
    val preMinor = snap("1_preminor_cut1", 1L)
    table.compactFeed()
    val postMinor = snap("2_postminor_cut1", 1L)
    table.majorCompact()
    val postMajor = snap("3_postmajor_cut2", 2L)
    val refused =
      try { table.mostRecentAsOf(1L); false }
      catch { case _: IllegalArgumentException => true }
    preMinor.unionByName(postMinor).unionByName(postMajor)
      .withColumn("refused_below_watermark", lit(refused))
      .orderBy($"phase", $"kbucket")
  }
  val q134_sql: String =
    s"""WITH m1 AS (
       |  SELECT o_orderkey AS entity_id,
       |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
       |         ELSE o_totalprice END AS value
       |  FROM orders WHERE o_orderkey % 7 <> 0
       |), m2 AS (
       |  SELECT o_orderkey AS entity_id,
       |    CASE WHEN o_orderkey % 10 = 6 THEN o_totalprice * 4
       |         WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
       |         ELSE o_totalprice END AS value
       |  FROM orders
       |  WHERE o_orderkey % 7 <> 0 OR o_orderkey % 10 = 6
       |), a1 AS (
       |  SELECT entity_id % 10 AS kbucket, count(*) AS n,
       |    ${sqlSum("value")} AS price_sum, '1_preminor_cut1' AS phase
       |  FROM m1 GROUP BY 1
       |), a2 AS (
       |  SELECT entity_id % 10 AS kbucket, count(*) AS n,
       |    ${sqlSum("value")} AS price_sum, '2_postminor_cut1' AS phase
       |  FROM m1 GROUP BY 1
       |), a3 AS (
       |  SELECT entity_id % 10 AS kbucket, count(*) AS n,
       |    ${sqlSum("value")} AS price_sum, '3_postmajor_cut2' AS phase
       |  FROM m2 GROUP BY 1)
       |SELECT kbucket, n, price_sum, phase,
       |  true AS refused_below_watermark
       |FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2
       |      UNION ALL SELECT * FROM a3)
       |ORDER BY phase, kbucket""".stripMargin

  // ── q187: BUCKETED physical fold — the rewrite-unit fix for the
  // table fold paths (applyChanges/majorCompact rewrite the whole table
  // per fold; at 100 TB a fold whose delta touches few key ranges must
  // not rewrite every range): entities route to xxhash64(entity_id)
  // mod 16 bucket roots, each its own generational root under the
  // all-or-nothing multi-root pointer commit; a fold rewrites ONLY the
  // buckets its feed + changes route to (TableDmlSpec proves untouched
  // buckets' files byte-identical). The merged read is unchanged, so
  // the folded bucketed table must serve exactly what the unbucketed
  // fold serves — the oracle replays the put chain over orders. ─────────
  val q187_bucketed_table_fold: Q = (s, d) => {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val cells = orders.select(
      $"o_orderkey".as("entity_id"), lit("ord").as("family"),
      lit("price").as("qualifier"), lit(0L).as("ts"),
      $"o_totalprice".as("value"))
    val table = new EntityTable(s, tmpTable("q187", d),
      TableLayout("orders_bucketed", Seq(FamilySpec("ord"))))
    table.bulkLoadBucketed(cells, numBuckets = 16, numPartitions = 32)
    def put(filterMod: Long, ts: Long, factor: Int) =
      orders.filter($"o_orderkey" % 10 === filterMod).select(
        $"o_orderkey".as("entity_id"), lit("ord").as("family"),
        lit("price").as("qualifier"), lit("put").as("op"), lit(ts).as("ts"),
        ($"o_totalprice" * factor).as("value"))
    table.appendChanges(put(3L, 1L, 2))
    // the PHYSICAL fold: feed (mod-10=3 puts) + changes (mod-10=6 puts)
    // rewrite only their routed buckets
    table.applyChanges(put(6L, 2L, 4), numPartitions = 32)
    table.mostRecentAsOf(Long.MaxValue)
      .groupBy(($"entity_id" % 10).as("kbucket"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("price_sum"))
      .orderBy($"kbucket")
  }
  val q187_sql: String =
    s"""WITH m AS (
       |  SELECT o_orderkey AS entity_id,
       |    CASE WHEN o_orderkey % 10 = 6 THEN o_totalprice * 4
       |         WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
       |         ELSE o_totalprice END AS value
       |  FROM orders)
       |SELECT entity_id % 10 AS kbucket, count(*) AS n,
       |  ${sqlSum("value")} AS price_sum
       |FROM m GROUP BY 1 ORDER BY kbucket""".stripMargin

  // ── q119: snapshot diff — the data-ops scorecard between two corpus
  // versions (SnapshotDiff.diffSummary): every doc_id classified
  // added/removed/changed/unchanged by fingerprint across a full-outer
  // join, rolled up per source. Both engines DERIVE the two snapshots
  // from the same documents table (old = ids not ≡0 mod 10; new = ids
  // not ≡0 mod 13, with ids ≡0 mod 7 textually revised), so the whole
  // classification matrix — including the changed set's fingerprint
  // inequality — is hash-verified. Scale shape: one full-outer
  // sort-merge join on the key + a bounded (source × 4)-row agg;
  // fingerprints are fixed-width, content never shuffles twice. ──────────
  val q119_snapshot_diff: Q = (s, d) => {
    import s.implicits._
    import graft.functions.TextFunctions.fingerprint
    val docs = Tables.documents(s, d)
    val oldSnap = docs.filter($"doc_id" % 10 =!= 0)
      .select($"doc_id", $"source", fingerprint($"text").as("fp"))
    val newSnap = docs.filter($"doc_id" % 13 =!= 0)
      .select($"doc_id", $"source",
        fingerprint(concat($"text",
          when($"doc_id" % 7 === 0, lit(" rev2")).otherwise(lit(""))))
          .as("fp"))
    graft.operators.SnapshotDiff
      .diffSummary(oldSnap, newSnap, "doc_id", "source", "fp")
      .orderBy($"source", $"status")
  }
  val q119_sql: String =
    """WITH oldd AS (
      |  SELECT doc_id, source,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents WHERE doc_id % 10 <> 0),
      |newd AS (
      |  SELECT doc_id, source,
      |    md5(trim(regexp_replace(lower(text ||
      |      CASE WHEN doc_id % 7 = 0 THEN ' rev2' ELSE '' END),
      |      '\s+', ' ', 'g'))) AS fp
      |  FROM documents WHERE doc_id % 13 <> 0),
      |j AS (
      |  SELECT coalesce(o.source, n.source) AS source,
      |    CASE WHEN o.fp IS NULL THEN 'added'
      |         WHEN n.fp IS NULL THEN 'removed'
      |         WHEN o.fp <> n.fp THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id)
      |SELECT source, status, count(*) AS n
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, Q] = Map(
    "q32_bulk_roundtrip" -> q32_bulk_roundtrip,
    "q33_dml_tombstones" -> q33_dml_tombstones,
    "q34_versioned_read" -> q34_versioned_read,
    "q74_wide_row" -> q74_wide_row,
    "q75_direct_write" -> q75_direct_write,
    "q41_composite_key" -> q41_composite_key,
    "q42_formatted_range" -> q42_formatted_range,
    "q44_locality_groups" -> q44_locality_groups,
    "q48_reader_schema" -> q48_reader_schema,
    "q50_incremental_dml" -> q50_incremental_dml,
    "q52_minor_compaction" -> q52_minor_compaction,
    "q133_read_asof" -> q133_read_asof,
    "q134_asof_compaction" -> q134_asof_compaction,
    "q119_snapshot_diff" -> q119_snapshot_diff,
    "q187_bucketed_table_fold" -> q187_bucketed_table_fold,
  )
  val oracleSql: Map[String, String] = Map(
    "q32_bulk_roundtrip" -> q32_sql,
    "q33_dml_tombstones" -> q33_sql,
    "q34_versioned_read" -> q34_sql,
    "q74_wide_row" -> q74_sql,
    "q75_direct_write" -> q75_sql,
    "q41_composite_key" -> q41_sql,
    "q42_formatted_range" -> q42_sql,
    "q44_locality_groups" -> q44_sql,
    "q48_reader_schema" -> q48_sql,
    "q50_incremental_dml" -> q50_sql,
    "q52_minor_compaction" -> q52_sql,
    "q133_read_asof" -> q133_sql,
    "q134_asof_compaction" -> q134_sql,
    "q119_snapshot_diff" -> q119_sql,
    // the bucketed fold must serve exactly the unbucketed fold's view
    "q187_bucketed_table_fold" -> q187_sql,
  )
}
