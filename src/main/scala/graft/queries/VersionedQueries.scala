package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import Num._

/** Versioned-cell semantics (SURVEY §1.1, §2.4) exercised on the `events`
  * table: each (user_id, event_type) is a cell with `ts`-versioned values,
  * exactly the Kiji (family, qualifier, timestamp) → value model.
  *
  * Reference anchors: max_versions retention (layout test.json:24-28),
  * time-range reads (KM/impl/HFileWriterContext.java:333-339), timestamped
  * deletes (KM/impl/HFileWriterContext.java:168-405).
  */
object VersionedQueries {
  type Q = (SparkSession, String) => DataFrame

  // ── most_recent(cell): latest version wins. Implemented as a single
  // partial-aggregable max(struct(ts, ...)) — no window, no collect_list,
  // so it scales with map-side combine at 100 TB. ─────────────────────────
  val q13_most_recent: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"user_id", $"event_type")
      .agg(max(struct($"ts", $"event_id", $"value")).as("m"))
      .select($"user_id", $"event_type",
        $"m.event_id".as("latest_event"), $"m.value".as("latest_value"))
      .orderBy($"user_id", $"event_type")
  }
  val q13_sql: String =
    """SELECT user_id, event_type, event_id AS latest_event,
      |  value AS latest_value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |        ORDER BY ts DESC, event_id DESC, value DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // ── max_versions = 3 retention (locality-group policy): keep the 3
  // newest versions per cell, aggregate the retained values. Single hash
  // aggregate (collect_list + in-row sort/slice/fold): one shuffle total,
  // no window sort, partial aggregation map-side — the 100 TB plan. ───────
  val q14_max_versions: Q = (s, d) => {
    import s.implicits._
    val top3 = slice(reverse(sort_array(
      collect_list(struct($"ts", $"event_id", $"value")))), 1, 3)
    Tables.events(s, d)
      .groupBy($"user_id", $"event_type")
      .agg(top3.as("top"))
      .select($"user_id", $"event_type",
        size($"top").cast(LongType).as("n_kept"),
        // acc must be DECIMAL(38,2): decimal + widens precision, and 38 is
        // the cap, so (38,2)+(30,2) stays (38,2) and the fold type-checks.
        aggregate($"top", lit(0).cast(DecimalType(38, 2)),
          (acc, x) => acc + x.getField("value").cast(DecimalType(30, 2)))
          .cast(DoubleType).as("sum_kept"))
      .orderBy($"user_id", $"event_type")
  }
  val q14_sql: String =
    s"""SELECT user_id, event_type, count(*) AS n_kept,
       |  ${sqlSum("value")} AS sum_kept
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |        ORDER BY ts DESC, event_id DESC, value DESC) AS rn FROM events)
       |WHERE rn <= 3 GROUP BY user_id, event_type
       |ORDER BY user_id, event_type""".stripMargin

  // ── TTL retention: cells older than 10 days before the newest write
  // expire (ttl_seconds in the reference layout). ─────────────────────────
  val q15_ttl: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val cutoff = ev.agg((max($"ts") - expr("INTERVAL 10 DAYS")).as("cutoff"))
    ev.join(broadcast(cutoff))
      .filter($"ts" >= $"cutoff")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_live"))
      .orderBy($"event_type")
  }
  val q15_sql: String =
    """SELECT event_type, count(*) AS n_live FROM events
      |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 10 DAY
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ── Timestamped delete (deleteColumn upToTimestamp): tombstone masks
  // all 'click' cells strictly older than the cutoff; survivors counted. ──
  val q16_tombstone_delete: Q = (s, d) => {
    import s.implicits._
    val cutoff = lit("2024-01-15").cast(TimestampType)
    Tables.events(s, d)
      .filter(!($"event_type" === "click" && $"ts" < cutoff))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_cells"), dsum($"value").as("sum_value"))
      .orderBy($"event_type")
  }
  val q16_sql: String =
    s"""SELECT event_type, count(*) AS n_cells, ${sqlSum("value")} AS sum_value
       |FROM events
       |WHERE NOT (event_type = 'click' AND ts < TIMESTAMP '2024-01-15')
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ── q101: SCD Type-2 interval view — every versioned cell write becomes
  // a validity interval [valid_from, valid_to) with the next write of the
  // SAME cell closing it (lead over the cell's version chain); the newest
  // version stays open (valid_to NULL, is_current true). This is the
  // dimensional-modeling surface of the Kiji timestamped-cell model: a
  // point-in-time join against it answers "what was this cell's value at
  // time T" relationally, where the reference walks HBase cell versions
  // imperatively (KM/impl/HFileWriterContext.java:333-339).
  //
  // Interval bounds are epoch MICROS as int64 (unix_micros / epoch_us):
  // Spark surfaces ts at µs and DuckDB at ns, so raw timestamps would
  // hash-mismatch on dtype; the underlying data is µs-precision, so both
  // engines see identical integers. Scale shape: ONE window partitioned
  // by the cell key (user_id, event_type) — co-partitioned with every
  // other per-cell operator, never a global window.
  val q101_scd2: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id", $"value")
    Tables.events(s, d)
      .withColumn("version", row_number().over(w).cast(LongType))
      .withColumn("valid_from_us", unix_micros($"ts"))
      .withColumn("valid_to_us", unix_micros(lead($"ts", 1).over(w)))
      .select($"user_id", $"event_type", $"version", $"event_id", $"value",
        $"valid_from_us", $"valid_to_us",
        $"valid_to_us".isNull.as("is_current"))
      .orderBy($"user_id", $"event_type", $"version")
  }
  val q101_sql: String =
    """SELECT user_id, event_type,
      |  row_number() OVER w AS version, event_id, value,
      |  epoch_us(ts) AS valid_from_us,
      |  epoch_us(lead(ts, 1) OVER w) AS valid_to_us,
      |  lead(ts, 1) OVER w IS NULL AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id, event_type
      |  ORDER BY ts, event_id, value)
      |ORDER BY user_id, event_type, version""".stripMargin

  val queries: Map[String, Q] = Map(
    "q13_most_recent" -> q13_most_recent,
    "q14_max_versions" -> q14_max_versions,
    "q15_ttl" -> q15_ttl,
    "q16_tombstone_delete" -> q16_tombstone_delete,
    "q101_scd2" -> q101_scd2,
  )

  val oracleSql: Map[String, String] = Map(
    "q13_most_recent" -> q13_sql,
    "q14_max_versions" -> q14_sql,
    "q15_ttl" -> q15_sql,
    "q16_tombstone_delete" -> q16_sql,
    "q101_scd2" -> q101_sql,
  )
}
