package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import Num._

/** Core relational queries re-expressing the reference's operator inventory
  * (SURVEY.md §2) on the TESTDATA tables, each paired with a DuckDB oracle.
  *
  * Naming: q{NN}_{operator} — NN groups by SURVEY §2 section.
  * Every query ends in a deterministic ORDER BY (mirrored in the oracle SQL)
  * so the hash compare is row-order independent.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  // ── §2.1 Gatherer + Reducer/Combiner: scan → shuffle agg ────────────────
  // Reference: KijiGatherer.gather + SimpleIntSumReducer
  // (KM/gather/KijiGatherer.java:158). Spark: groupBy().agg() — partial+final
  // hash aggregate gives the combiner for free.
  val q01_gather_agg: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("sum_disc_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val q01_sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
       |  ${sqlAvg("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ── §2.1/§5 Gatherer + distinct-count reducer (TestGathererReducer:
  // distinct users per zip). Here: distinct customers per order priority. ──
  val q02_gather_distinct: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n_cust"),
           count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }
  val q02_sql: String =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ── §2.1 Producer: per-row derivation written back to the entity row
  // (KijiProducer.produce, KM/produce/KijiProducer.java:183). ──────────────
  val q03_producer: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .select(
        $"c_custkey".as("entity_id"),
        upper($"c_name").as("name_upper"),
        floor($"c_acctbal").cast(DoubleType).as("bal_floor"),
        when($"c_acctbal" < 0, "neg")
          .when($"c_acctbal" < 5000, "mid")
          .otherwise("high").as("bal_bucket"))
      .orderBy($"entity_id")
  }
  val q03_sql: String =
    """SELECT c_custkey AS entity_id, upper(c_name) AS name_upper,
      |  CAST(floor(c_acctbal) AS DOUBLE) AS bal_floor,
      |  CASE WHEN c_acctbal < 0 THEN 'neg'
      |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_bucket
      |FROM customer ORDER BY entity_id""".stripMargin

  // ── §2.1 Pivoter: scan table A, write cells keyed by a different entity
  // (KijiPivoter.produce, KM/pivot/KijiPivoter.java:168). Re-key lineitem
  // rows onto the supplier entity. ─────────────────────────────────────────
  val q04_pivoter: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_suppkey".as("entity_id"))
      .agg(count(lit(1)).as("n_items"), dsum($"l_quantity").as("total_qty"))
      .orderBy($"entity_id")
  }
  val q04_sql: String =
    s"""SELECT l_suppkey AS entity_id, count(*) AS n_items,
       |  ${sqlSum("l_quantity")} AS total_qty
       |FROM lineitem GROUP BY l_suppkey ORDER BY entity_id""".stripMargin

  // ── §2.1 Bulk importer: records → cell puts → grouped entity rows
  // (KijiBulkImporter.produce, KM/bulkimport/KijiBulkImporter.java:163). ───
  val q05_bulk_import: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_orderkey".as("entity_id"))
      .agg(count(lit(1)).as("n_cells"),
           countDistinct($"l_linenumber").as("n_qualifiers"),
           dsum($"l_extendedprice").as("total_price"))
      .orderBy($"entity_id")
  }
  val q05_sql: String =
    s"""SELECT l_orderkey AS entity_id, count(*) AS n_cells,
       |  count(DISTINCT l_linenumber) AS n_qualifiers,
       |  ${sqlSum("l_extendedprice")} AS total_price
       |FROM lineitem GROUP BY l_orderkey ORDER BY entity_id""".stripMargin

  // ── §2.5 KeyValueStore lookup join: orders → customer → nation, both
  // dims broadcast (the reference ships stores via DistributedCache;
  // Spark: broadcast hash join). ───────────────────────────────────────────
  val q06_kvstore_join: Q = (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select($"c_custkey", $"c_nationkey")
    val n = Tables.nation(s, d).select($"n_nationkey", $"n_name")
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"n_name")
  }
  val q06_sql: String =
    s"""SELECT n_name, count(*) AS n_orders, ${sqlSum("o_totalprice")} AS revenue
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ── §2.5 get() → null / containsKey semantics: left-anti (keys missing
  // from the store). ──────────────────────────────────────────────────────
  val q07_lookup_missing: Q = (s, d) => {
    import s.implicits._
    val p = Tables.part(s, d).select($"p_partkey")
    val li = Tables.lineitem(s, d)
      .filter($"l_shipdate" < lit("1995-06-01").cast(TimestampType))
      .select($"l_partkey")
    p.join(li, $"p_partkey" === $"l_partkey", "left_anti")
      .orderBy($"p_partkey")
  }
  val q07_sql: String =
    """SELECT p_partkey FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_shipdate < TIMESTAMP '1995-06-01'
      |                    AND l_partkey = p_partkey)
      |ORDER BY p_partkey""".stripMargin

  // ── §2.3/§2.7 IdentityReducer + HFile output: total-order sort on the
  // entity key (TotalOrderPartitioner analog = range partition + sort). ───
  val q08_total_sort: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_partkey")
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val q08_sql: String =
    """SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ── §2.7 Top-k per group (capability upside: window row_number). ────────
  val q09_topk: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rn")
  }
  val q09_sql: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  // ── §2.8 Window running aggregate (capability upside). ──────────────────
  val q10_window_running: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey",
        sum($"o_totalprice".cast(DecimalType(30, 2))).over(w)
          .cast(DoubleType).as("running_spend"))
      .orderBy($"o_custkey", $"o_orderkey")
  }
  val q10_sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ── §2.8 Set operations (capability upside). ────────────────────────────
  val q11_setops: Q = (s, d) => {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_custkey")
    val o = Tables.orders(s, d).select($"o_custkey".as("c_custkey"))
    val ex = c.except(o).agg(count(lit(1)).as("n")).select(lit("except").as("op"), $"n")
    val in = c.intersect(o).agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), $"n")
    val un = c.union(o).distinct().agg(count(lit(1)).as("n")).select(lit("union").as("op"), $"n")
    ex.union(in).union(un).orderBy($"op")
  }
  val q11_sql: String =
    """SELECT 'except' AS op, count(*) AS n FROM
      |  (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT 'intersect' AS op, count(*) AS n FROM
      |  (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT 'union' AS op, count(*) AS n FROM
      |  (SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders)
      |ORDER BY op""".stripMargin

  // ── §2.6 Rollup aggregation (capability upside; reference has none). ────
  val q12_rollup: Q = (s, d) => {
    import s.implicits._
    val su = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    su.join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(dsum($"s_acctbal").as("total_bal"), count(lit(1)).as("n_supp"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }
  val q12_sql: String =
    s"""SELECT r_name, n_name, ${sqlSum("s_acctbal")} AS total_bal,
       |  count(*) AS n_supp
       |FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)
       |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // ── q67: exact per-group discrete quantiles (lineitem-free §2.6 depth).
  // NOT the naive row_number-per-group plan — that hashes a whole group
  // onto one reducer (a skew cliff when a group is 10 TB). Instead:
  // pre-aggregate (group, value) counts (map-side combine carries the
  // weight), then run the cumulative window over DISTINCT values only —
  // per-group window input is bounded by value cardinality, not row
  // count. The pick `min(value where cum >= ceil(q*n))` is exactly
  // DuckDB's quantile_disc, which the oracle computes NATIVELY — an
  // independent implementation, not a mirrored one. Rank targets use
  // integer ceil ((q*n + 99) div 100): 0.9*n in doubles is off by 2 ULP
  // at n=10 and would pick rank 10, not 9. ───────────────────────────────
  val q67_quantiles: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val vc = Tables.documents(s, d)
      .groupBy($"lang", $"n_chars").agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy($"lang").orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy($"lang")
    vc.withColumn("cum", sum($"c").over(cumW))
      .withColumn("n", sum($"c").over(totW))
      .groupBy($"lang")
      .agg(max($"n").as("n_docs"),
        min(when($"cum" >= expr("(25*n + 99) div 100"), $"n_chars")).as("p25"),
        min(when($"cum" >= expr("(50*n + 99) div 100"), $"n_chars")).as("p50"),
        min(when($"cum" >= expr("(90*n + 99) div 100"), $"n_chars")).as("p90"))
      .orderBy($"lang")
  }
  val q67_sql: String =
    """SELECT lang, count(*) AS n_docs,
      |  quantile_disc(n_chars, 0.25) AS p25,
      |  quantile_disc(n_chars, 0.50) AS p50,
      |  quantile_disc(n_chars, 0.90) AS p90
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ── q69: salted skew join — lineitem × orders through SkewJoin's
  // manual salting (brief: "salting for skew"). The salted plan is
  // row-identical to the plain join, so the oracle is the UNSALTED SQL
  // join: what's verified is that splitting a hot key across `salt`
  // reducers changes the shuffle topology and nothing else. ──────────────
  val q69_salted_join: Q = (s, d) => {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_partkey", $"l_extendedprice")
    val o = Tables.orders(s, d)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    graft.operators.SkewJoin
      .saltedInner(li, o, "l_orderkey", salt = 8, leftSaltSrc = "l_partkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"), dsum($"l_extendedprice").as("revenue"))
      .orderBy($"o_orderpriority")
  }
  val q69_sql: String =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |  ${sqlSum("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ── q73: data profiling (ANALYZE-style column statistics) — count,
  // nulls, exact NDV, min/max, exact decimal sum per numeric column, in
  // ONE pass: the columns unpivot into (col, value) rows at the scan
  // (explode of a 4-struct array — map-side, no join), then a single
  // grouped aggregate profiles all of them. Per-column full scans (the
  // naive ANALYZE loop) would read the table N times. ────────────────────
  val ProfileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  val q73_profile: Q = (s, d) => {
    import s.implicits._
    val entries = ProfileCols.map { c =>
      struct(lit(c).as("col"), col(c).cast(DoubleType).as("v"))
    }
    Tables.lineitem(s, d)
      .select(explode(array(entries: _*)).as("e"))
      .select($"e.col".as("col"), $"e.v".as("v"))
      .groupBy($"col")
      .agg(count(lit(1)).as("n"),
        sum(when($"v".isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct($"v").as("ndv"),
        min($"v").as("vmin"), max($"v").as("vmax"),
        dsum($"v", 6).as("vsum"))
      .orderBy($"col")
  }
  val q73_sql: String = {
    val legs = ProfileCols.map { c =>
      s"""SELECT '$c' AS col, CAST($c AS DOUBLE) AS v FROM lineitem"""
    }.mkString("\nUNION ALL\n")
    s"""WITH u AS (
       |$legs
       |)
       |SELECT col, count(*) AS n,
       |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  count(DISTINCT v) AS ndv,
       |  min(v) AS vmin, max(v) AS vmax,
       |  ${sqlSum("v", 6)} AS vsum
       |FROM u GROUP BY col ORDER BY col""".stripMargin
  }

  // ── q123: Pearson correlation matrix — ANALYZE-style pairwise column
  // statistics (q73's companion): every unordered pair of the profiled
  // numeric columns gets n, exact sums, and the correlation, from ONE
  // pass over the table. All 14 running sums (Σc, Σc², Σc·c' per pair)
  // are exact decimals (addition-order-free — see Num), so the only
  // doubles are the final corr chain on identical operands in both
  // engines. Scale shape: a single full-map-side-combine aggregate with
  // 1-row state; the 6 output rows unfold from that row — no second
  // scan, no join, no window. ────────────────────────────────────────────
  val CorrPairs: Seq[(String, String)] = {
    val cs = ProfileCols
    for (i <- cs.indices; j <- i + 1 until cs.size) yield (cs(i), cs(j))
  }

  val q123_correlations: Q = (s, d) => {
    import s.implicits._
    // products: LEFT operand at precision 19 — DuckDB multiplies two
    // int64-width (≤18) decimals in raw int64 and overflows; 19 forces
    // its int128 path, and Spark's (19,4)×(18,4) → (38,8) is exact too,
    // so both engines carry the identical exact value
    def dec(c: String) = col(c).cast(DecimalType(18, 4))
    def decW(c: String) = col(c).cast(DecimalType(19, 4))
    val sums =
      ProfileCols.map(c => sum(dec(c)).as(s"s_$c")) ++
      ProfileCols.map(c => sum(decW(c) * dec(c)).as(s"ss_$c")) ++
      CorrPairs.map { case (a, b) => sum(decW(a) * dec(b)).as(s"sp_${a}_$b") }
    val allAggs = count(lit(1)).as("n") +: sums
    val stats = Tables.lineitem(s, d).agg(allAggs.head, allAggs.tail: _*)
    // corr = (n·Σxy − Σx·Σy) / (sqrt(n·Σxx − Σx²) · sqrt(n·Σyy − Σy²)),
    // every operand cast from its exact decimal ONCE, fixed order
    def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    val rows = CorrPairs.map { case (a, b) =>
      val n = D(col("n"))
      val corr =
        (n * D(col(s"sp_${a}_$b")) - D(col(s"s_$a")) * D(col(s"s_$b"))) /
          (sqrt(n * D(col(s"ss_$a")) - D(col(s"s_$a")) * D(col(s"s_$a"))) *
            sqrt(n * D(col(s"ss_$b")) - D(col(s"s_$b")) * D(col(s"s_$b"))))
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
        D(col(s"sp_${a}_$b")).as("sum_xy"), corr.as("corr"))
    }
    stats.select(explode(array(rows: _*)).as("r"))
      .select($"r.col_a", $"r.col_b", $"r.n", $"r.sum_xy", $"r.corr")
      .orderBy($"col_a", $"col_b")
  }
  lazy val q123_sql: String = {
    def dec(c: String) = s"CAST($c AS DECIMAL(18,4))"
    val legs = CorrPairs.map { case (a, b) =>
      val corr =
        s"""(CAST(n AS DOUBLE) * CAST(sp_${a}_$b AS DOUBLE)
           |      - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
           |    / (sqrt(CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE)
           |        - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
           |      * sqrt(CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE)
           |        - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))""".stripMargin
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
         |  CAST(sp_${a}_$b AS DOUBLE) AS sum_xy,
         |  $corr AS corr
         |FROM stats""".stripMargin
    }.mkString("\nUNION ALL\n")
    def decW(c: String) = s"CAST($c AS DECIMAL(19,4))"
    val aggs =
      (ProfileCols.map(c => s"sum(${dec(c)}) AS s_$c") ++
        ProfileCols.map(c => s"sum(${decW(c)} * ${dec(c)}) AS ss_$c") ++
        CorrPairs.map { case (a, b) =>
          s"sum(${decW(a)} * ${dec(b)}) AS sp_${a}_$b" }).mkString(",\n  ")
    s"""WITH stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |  $aggs
       |  FROM lineitem
       |)
       |$legs
       |ORDER BY col_a, col_b""".stripMargin
  }

  // ── q124: robust outlier detection (median/MAD) — the data-cleaning
  // filter that survives the outliers it hunts (mean/stddev don't):
  // per-group median and MAD estimated from the BOUNDED histogram sketch
  // (Sketches.histQuantilesBy, q121's machinery — deterministic bucket-lo
  // estimates, error ≤ bucket width), then every row flagged by the
  // integer rule dev > 3·mad. Two sketch passes + two broadcast joins +
  // one agg — no corpus sort, no global window, values as exact integer
  // cents so both engines agree bit-for-bit. ─────────────────────────────
  val MadWidth = 16384L // cents (~$163 buckets over the price range)
  val MadK = 3L

  val q124_mad_outliers: Q = (s, d) => {
    import s.implicits._
    import graft.operators.{OperatorCaches, Sketches}
    // exact integer cents via the decimal route (a double ×100 truncates
    // wrong: 101211.99*100 = 10121198.999…)
    val cents = ($"l_extendedprice".cast(DecimalType(18, 2)) * 100)
      .cast(LongType)
    // vals feeds the median sketch AND the dev computation; dev feeds the
    // MAD sketch AND the final flag agg — persist each once
    val vals = OperatorCaches.register(
      Tables.lineitem(s, d)
        .select($"l_returnflag".as("g"), cents.as("x")).persist())
    val med = Sketches.histQuantilesBy(vals, Seq("g"), "x", MadWidth,
        Seq((1L, 2L)))
      .select($"g", $"lo".as("med_lo"))
    val dev = OperatorCaches.register(
      vals.join(broadcast(med), "g")
        .withColumn("dev", abs($"x" - $"med_lo")).persist())
    val mad = Sketches.histQuantilesBy(dev, Seq("g"), "dev", MadWidth,
        Seq((1L, 2L)))
      .select($"g", $"lo".as("mad_lo"))
    dev.join(broadcast(mad), "g")
      .groupBy($"g")
      .agg(count(lit(1)).as("n"),
        max($"med_lo").as("med_lo"),
        max($"mad_lo").as("mad_lo"),
        sum(when($"dev" > lit(MadK) * $"mad_lo", 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_frac",
        $"n_outliers".cast(DoubleType) / $"n".cast(DoubleType))
      .orderBy($"g")
  }
  lazy val q124_sql: String = {
    def histCut(src: String, vcol: String, out: String) =
      s"""h_$out AS (
         |  SELECT g, $vcol // $MadWidth AS bucket, count(*) AS cnt
         |  FROM $src GROUP BY 1, 2),
         |c_$out AS (
         |  SELECT g, bucket,
         |    sum(cnt) OVER (PARTITION BY g ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    sum(cnt) OVER (PARTITION BY g) AS n
         |  FROM h_$out),
         |$out AS (
         |  SELECT g, min(bucket) * $MadWidth AS $out
         |  FROM c_$out WHERE cum >= (n + 1) // 2 GROUP BY g)""".stripMargin
    s"""WITH vals AS (
       |  SELECT l_returnflag AS g,
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
       |  FROM lineitem),
       |${histCut("vals", "x", "med_lo")},
       |devs AS (
       |  SELECT v.g, v.x, abs(v.x - m.med_lo) AS dev, m.med_lo
       |  FROM vals v JOIN med_lo m USING (g)),
       |${histCut("devs", "dev", "mad_lo")}
       |SELECT d.g, count(*) AS n,
       |  max(d.med_lo) AS med_lo, max(a.mad_lo) AS mad_lo,
       |  CAST(sum(CASE WHEN d.dev > $MadK * a.mad_lo THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_outliers,
       |  CAST(sum(CASE WHEN d.dev > $MadK * a.mad_lo THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(count(*) AS DOUBLE) AS outlier_frac
       |FROM devs d JOIN mad_lo a USING (g)
       |GROUP BY d.g ORDER BY g""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q01_gather_agg" -> q01_gather_agg,
    "q02_gather_distinct" -> q02_gather_distinct,
    "q03_producer" -> q03_producer,
    "q04_pivoter" -> q04_pivoter,
    "q05_bulk_import" -> q05_bulk_import,
    "q06_kvstore_join" -> q06_kvstore_join,
    "q07_lookup_missing" -> q07_lookup_missing,
    "q08_total_sort" -> q08_total_sort,
    "q09_topk" -> q09_topk,
    "q10_window_running" -> q10_window_running,
    "q11_setops" -> q11_setops,
    "q12_rollup" -> q12_rollup,
    "q67_quantiles" -> q67_quantiles,
    "q69_salted_join" -> q69_salted_join,
    "q73_profile" -> q73_profile,
    "q123_correlations" -> q123_correlations,
    "q124_mad_outliers" -> q124_mad_outliers,
  )

  val oracleSql: Map[String, String] = Map(
    "q01_gather_agg" -> q01_sql,
    "q02_gather_distinct" -> q02_sql,
    "q03_producer" -> q03_sql,
    "q04_pivoter" -> q04_sql,
    "q05_bulk_import" -> q05_sql,
    "q06_kvstore_join" -> q06_sql,
    "q07_lookup_missing" -> q07_sql,
    "q08_total_sort" -> q08_sql,
    "q09_topk" -> q09_sql,
    "q10_window_running" -> q10_sql,
    "q11_setops" -> q11_sql,
    "q12_rollup" -> q12_sql,
    "q67_quantiles" -> q67_sql,
    "q69_salted_join" -> q69_sql,
    "q73_profile" -> q73_sql,
    "q123_correlations" -> q123_sql,
    "q124_mad_outliers" -> q124_sql,
  )
}
