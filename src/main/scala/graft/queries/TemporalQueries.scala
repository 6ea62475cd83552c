package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Temporal

/** Temporal operators over the `events` table: gap sessionization (q61) and
  * the as-of join (q62). Both are one-shuffle sort-merge plans — see
  * [[graft.operators.Temporal]] for the scale argument. The DuckDB oracle
  * mirrors q61 with the identical window algebra and q62 with its native
  * ASOF LEFT JOIN, so the semantics are checked against an independent
  * implementation, not a re-derivation.
  */
object TemporalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** 24h inactivity gap: events are ~2/user/day, so sessions span a few
    * events — large enough to exercise both the split and the merge side. */
  private val GapMicros = 86400L * 1000000L

  // ── q61: gap-based sessionization → per-session rollup ──────────────────
  val q61_sessionize: Q = (s, d) => {
    import s.implicits._
    val sess = Temporal.sessionize(
      Tables.events(s, d), "user_id", "ts", GapMicros, "event_id")
    sess.groupBy($"user_id", $"session_idx")
      .agg(
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        count(lit(1)).as("n_events"),
        Num.dsum($"value", 6).as("total_value"))
      .orderBy($"user_id", $"session_idx")
  }
  val q61_sql: String =
    s"""WITH seq AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $GapMicros
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts, value,
       |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS session_idx
       |  FROM seq)
       |SELECT user_id, session_idx,
       |  min(ts) AS session_start, max(ts) AS session_end,
       |  count(*) AS n_events, ${Num.sqlSum("value", 6)} AS total_value
       |FROM sess GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  // ── q62: as-of join — each event sees the user's most recent purchase.
  // The right side is deduped to one row per (user, ts) in BOTH engines
  // first: asOfJoin resolves right ties deterministically (greatest
  // payload struct) but DuckDB's ASOF JOIN picks an arbitrary tied row,
  // so tie-free input is the only oracle-comparable contract. ────────────
  val q62_asof_join: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("purchase_id"),
        max_by($"value", $"event_id").as("purchase_value"))
    val others = ev.filter($"event_type" =!= "purchase")
      .select($"event_id", $"user_id", $"ts")
    Temporal.asOfJoin(others, purchases, "user_id", "ts", "ts",
        Seq("purchase_id", "purchase_value"))
      .orderBy($"event_id")
  }
  val q62_sql: String =
    """WITH p AS (
      |  SELECT user_id AS k, ts AS rts,
      |    max(event_id) AS purchase_id,
      |    arg_max(value, event_id) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |c AS (
      |  SELECT event_id, user_id, ts FROM events
      |  WHERE event_type <> 'purchase')
      |SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.purchase_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.k AND c.ts >= p.rts
      |ORDER BY c.event_id""".stripMargin

  // ── q70: Z-order layout roundtrip — events rewritten Morton-clustered
  // on (user_id, ts), then a two-dimensional box query over the new
  // layout. The oracle runs the same box query on the ORIGINAL table, so
  // what's verified is that the physical rewrite is lossless; the point
  // of the layout (file-level min/max pruning on BOTH dims) is asserted
  // in ZOrderSpec. ────────────────────────────────────────────────────────
  val q70_zorder_scan: Q = (s, d) => {
    import s.implicits._
    val tmp = QueryTmp.dir("zorder", d)
    val ev = Tables.events(s, d).withColumn("ts_us", unix_micros($"ts"))
    graft.sinks.ZOrder.writeZOrdered(ev, tmp, "user_id", "ts_us",
      bits = 12, numFiles = 16)
    s.read.parquet(tmp)
      .filter($"user_id" >= 40 && $"user_id" < 60 &&
        $"ts" >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-20 00:00:00").cast("timestamp"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), Num.dsum($"value", 6).as("sum_value"))
      .orderBy($"user_id")
  }
  val q70_sql: String =
    s"""SELECT user_id, count(*) AS n, ${Num.sqlSum("value", 6)} AS sum_value
       |FROM events
       |WHERE user_id >= 40 AND user_id < 60
       |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
       |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ── q91: ordered funnel (view → click → purchase) — time-ordered stage
  // progression (each stage strictly after the user's previous stage),
  // NOT mere event presence. Temporal.funnel's chain of co-partitioned
  // min-agg joins; the presentation rolls the reached-stage rows up to
  // per-stage user counts and the exact total conversion lag in µs. ──────
  val FunnelStages = Seq("view", "click", "purchase")

  val q91_funnel: Q = (s, d) => {
    import s.implicits._
    Temporal.funnel(Tables.events(s, d), "user_id", "ts", "event_type",
        FunnelStages)
      .groupBy($"stage_idx", $"stage")
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(unix_micros($"stage_ts") - unix_micros($"prev_ts"),
          lit(0L))).as("total_lag_us"))
      .orderBy($"stage_idx")
  }
  // generated from FunnelStages at ANY length; each branch carries
  // HAVING count(*) > 0 so a stage nobody reaches emits NO row — matching
  // the Spark side, whose groupBy simply has no rows for that stage (an
  // ungrouped UNION branch would otherwise always emit (0, NULL))
  val q91_sql: String = {
    val first =
      s"""f0 AS (
         |  SELECT user_id, min(ts) AS t FROM events
         |  WHERE event_type = '${FunnelStages.head}' GROUP BY user_id)""".stripMargin
    val rest = FunnelStages.zipWithIndex.tail.map { case (st, i) =>
      s"""f$i AS (
         |  SELECT e.user_id, min(e.ts) AS t, min(f${i - 1}.t) AS pt
         |  FROM events e JOIN f${i - 1} ON f${i - 1}.user_id = e.user_id
         |    AND e.ts > f${i - 1}.t
         |  WHERE e.event_type = '$st' GROUP BY e.user_id)""".stripMargin
    }
    val branches =
      s"""SELECT 0 AS stage_idx, '${FunnelStages.head}' AS stage,
         |  count(*) AS n_users, 0::BIGINT AS total_lag_us FROM f0
         |HAVING count(*) > 0""".stripMargin +:
        FunnelStages.zipWithIndex.tail.map { case (st, i) =>
          s"""SELECT $i, '$st', count(*),
             |  CAST(sum(epoch_us(t) - epoch_us(pt)) AS BIGINT) FROM f$i
             |HAVING count(*) > 0""".stripMargin
        }
    s"""WITH ${(first +: rest).mkString(",\n")}
       |${branches.mkString("\nUNION ALL\n")}
       |ORDER BY stage_idx""".stripMargin
  }

  // ── q92: cohort retention — users grouped by first-seen week (the
  // cohort), counted as retained in each later week they were active.
  // Weeks are pure integer epoch-µs division (no date-function dialect
  // risk); the shape is one per-user min-agg + one distinct-activity agg
  // + a co-partitioned join — the warehouse-standard retention triangle,
  // never a per-user window. ─────────────────────────────────────────────
  private val WeekMicros = 7L * 86400L * 1000000L

  val q92_cohort_retention: Q = (s, d) => {
    import s.implicits._
    // `div`, not `/`: Column./ is double division, and a ratio the double
    // rounds UP across an integer boundary would truncate to the wrong
    // week — integer div matches DuckDB's `//` exactly FOR NONNEGATIVE
    // operands. They diverge below zero (div truncates toward zero, //
    // floors), and a pre-1970 timestamp would also land in the wrong week
    // bucket — so negative epoch-µs fails loudly here instead of
    // silently diverging from the oracle (assert_true is NULL on pass;
    // the isNull filter keeps the guard in the plan).
    // NULL ts passes through (both engines flow NULL → NULL week
    // identically); only the genuinely-diverging negative case fails.
    val ev = Tables.events(s, d)
      .select($"user_id", unix_micros($"ts").as("us"))
      .filter(assert_true($"us".isNull || $"us" >= 0L,
        lit("q92 cohort weeks assume nonnegative epoch timestamps " +
          "(Spark div truncates toward zero; the oracle's // floors)")).isNull)
      .select($"user_id", expr(s"us div ${WeekMicros}L").as("week"))
    val cohorts = ev.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    val active = ev.distinct()
    // count(*), not countDistinct: `active` is already unique on
    // (user_id, week) and cohort_week is functionally dependent on
    // user_id, so each user appears once per group — a distinct aggregate
    // would just add an expand + extra shuffle stage
    active.join(cohorts, "user_id")
      .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }
  val q92_sql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) // $WeekMicros AS week FROM events),
       |cohorts AS (
       |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id),
       |active AS (SELECT DISTINCT user_id, week FROM ev)
       |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
       |  count(DISTINCT a.user_id) AS n_users
       |FROM active a JOIN cohorts c USING (user_id)
       |GROUP BY c.cohort_week, week_offset
       |ORDER BY cohort_week, week_offset""".stripMargin

  // ── q117: session transition matrix — first-order Markov statistics of
  // what-follows-what WITHIN a session (Temporal.transitionCounts over
  // q61's sessionization): transition counts, per-from totals, and an
  // int64-scaled conditional probability P(to|from) = n·2^20 div n_from
  // (pure integer math — trunc and floor agree on nonnegatives, so the
  // engines stay exact). The sequence-mining counterpart of q91's funnel:
  // the funnel checks ONE prescribed order, this measures ALL observed
  // orders. Scale shape: one lag-window co-partitioned on the session
  // keys (the sessionizer's own shuffle, reused) → a bounded |states|²
  // aggregation → a broadcast-sized totals join. ─────────────────────────
  val TransScale = 1048576L // 2^20

  val q117_markov_transitions: Q = (s, d) => {
    import s.implicits._
    val sess = Temporal.sessionize(
      Tables.events(s, d), "user_id", "ts", GapMicros, "event_id")
    val trans = Temporal.transitionCounts(sess,
        Seq("user_id", "session_idx"), Seq("ts", "event_id"), "event_type")
      .withColumnRenamed("from_state", "from_type")
      .withColumnRenamed("to_state", "to_type")
    val totals = trans.groupBy($"from_type").agg(sum($"n").as("n_from"))
    trans.join(broadcast(totals), "from_type")
      .withColumn("p_scaled", expr(s"n * $TransScale div n_from"))
      .select($"from_type", $"to_type", $"n", $"n_from", $"p_scaled")
      .orderBy($"from_type", $"to_type")
  }
  val q117_sql: String =
    s"""WITH seq AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $GapMicros
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS session_idx
       |  FROM seq),
       |tr AS (
       |  SELECT event_type,
       |    lag(event_type) OVER (PARTITION BY user_id, session_idx
       |      ORDER BY ts, event_id) AS prev
       |  FROM sess),
       |cnt AS (
       |  SELECT prev AS from_type, event_type AS to_type, count(*) AS n
       |  FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2),
       |tot AS (
       |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
       |  FROM cnt GROUP BY 1)
       |SELECT from_type, to_type, n, n_from,
       |  CAST(n * $TransScale // n_from AS BIGINT) AS p_scaled
       |FROM cnt JOIN tot USING (from_type)
       |ORDER BY from_type, to_type""".stripMargin

  // ── q118: sliding-window attribution — for every non-purchase event,
  // the count and exact decimal sum of the user's purchases in the 7 days
  // strictly before it (Temporal.recentWindowAgg). Where q62's as-of join
  // attaches the single MOST RECENT prior purchase, this aggregates ALL
  // purchases in the window — the classic attribution/feature-engineering
  // range join, executed as a bucketed EQUI-join (right side replicated
  // exactly 2×, candidates bounded by per-key density × 2·window) instead
  // of a per-key cross product. The oracle replays the naive correlated
  // range join — an independent formulation of the same semantics — so
  // the bucketing rewrite itself is what gets verified. ──────────────────
  val AttrWindowMicros = 7L * 86400L * 1000000L // 7 days

  val q118_window_attribution: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"value")
    val others = ev.filter($"event_type" =!= "purchase")
      .select($"event_id", $"user_id", $"ts")
    Temporal.recentWindowAgg(others, purchases, "user_id", "event_id",
        "ts", "pts", AttrWindowMicros, "value", valueScale = 6)
      .select($"event_id", $"user_id", $"n_in_window", $"win_value")
      .orderBy($"event_id")
  }
  val q118_sql: String =
    s"""WITH p AS (
       |  SELECT user_id, ts AS pts, value FROM events
       |  WHERE event_type = 'purchase'),
       |o AS (
       |  SELECT event_id, user_id, ts FROM events
       |  WHERE event_type <> 'purchase')
       |SELECT o.event_id, o.user_id,
       |  count(p.user_id) AS n_in_window,
       |  coalesce(CAST(sum(CAST(p.value AS DECIMAL(30,6))) AS DOUBLE), 0.0)
       |    AS win_value
       |FROM o LEFT JOIN p ON p.user_id = o.user_id
       |  AND epoch_us(p.pts) >= epoch_us(o.ts) - $AttrWindowMicros
       |  AND epoch_us(p.pts) < epoch_us(o.ts)
       |GROUP BY o.event_id, o.user_id
       |ORDER BY o.event_id""".stripMargin

  // ── q126: time-series resampling — each user's irregular event stream
  // regularized onto a daily grid with LAST-OBSERVATION forward-fill
  // (the feature-engineering "resample('1D').ffill()" pass): one grid
  // row per user per UTC day of their activity span, carrying the day's
  // event count (0 on gap days) and the most recent event as of day end
  // (Temporal.asOfJoin against the tie-free observation set — q62's
  // machinery on a GENERATED left side). Scale shape: the grid explodes
  // to users × span-days rows (bounded by activity, not event count);
  // the fill is the one-shuffle sort-merge as-of pass; the oracle
  // replays it with DuckDB's native ASOF LEFT JOIN. ──────────────────────
  val DayMicros = 86400000000L

  /** FLOOR epoch-day of a µs expression (DuckDB's `//` semantics):
    * Spark's `div` truncates toward zero, which would shift every
    * pre-1970 timestamp one day late relative to the oracle. */
  private def floorDay(usExpr: String): String =
    s"($usExpr div ${DayMicros}L - " +
      s"(CASE WHEN $usExpr % ${DayMicros}L < 0 THEN 1 ELSE 0 END))"

  val q126_resample_ffill: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val spans = ev.groupBy($"user_id")
      .agg(min(unix_micros($"ts")).as("us0"),
        max(unix_micros($"ts")).as("us1"))
    val grid = spans.select($"user_id",
        explode(sequence(expr(floorDay("us0")),
          expr(floorDay("us1")))).as("day"))
      .withColumn("ts", timestamp_micros(($"day" + 1) * DayMicros - 1))
    val obs = ev.groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("obs_id"),
        max_by($"value", $"event_id").as("obs_value"))
    val filled = Temporal.asOfJoin(grid, obs, "user_id", "ts", "ts",
      Seq("obs_id", "obs_value"))
    val perDay = ev
      .select($"user_id",
        expr(floorDay("unix_micros(ts)")).as("day"))
      .groupBy($"user_id", $"day").agg(count(lit(1)).as("n_day_events"))
    filled.join(perDay, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        coalesce($"n_day_events", lit(0L)).as("n_day_events"),
        $"obs_id", $"obs_value")
      .orderBy($"user_id", $"day")
  }
  val q126_sql: String =
    s"""WITH spans AS (
       |  SELECT user_id, epoch_us(min(ts)) // $DayMicros AS d0,
       |    epoch_us(max(ts)) // $DayMicros AS d1
       |  FROM events GROUP BY 1),
       |grid AS (
       |  SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM spans),
       |g2 AS (
       |  SELECT user_id, day,
       |    make_timestamp((day + 1) * $DayMicros - 1) AS ts
       |  FROM grid),
       |obs AS (
       |  SELECT user_id AS k, ts AS rts, max(event_id) AS obs_id,
       |    arg_max(value, event_id) AS obs_value
       |  FROM events GROUP BY 1, 2),
       |f AS (
       |  SELECT g.user_id, g.day, o.obs_id, o.obs_value
       |  FROM g2 g ASOF LEFT JOIN obs o
       |    ON g.user_id = o.k AND g.ts >= o.rts),
       |pd AS (
       |  SELECT user_id, epoch_us(ts) // $DayMicros AS day,
       |    count(*) AS n
       |  FROM events GROUP BY 1, 2)
       |SELECT f.user_id, f.day, coalesce(pd.n, 0) AS n_day_events,
       |  f.obs_id, f.obs_value
       |FROM f LEFT JOIN pd USING (user_id, day)
       |ORDER BY user_id, day""".stripMargin

  val queries: Map[String, Q] = Map(
    "q61_sessionize" -> q61_sessionize,
    "q62_asof_join" -> q62_asof_join,
    "q70_zorder_scan" -> q70_zorder_scan,
    "q91_funnel" -> q91_funnel,
    "q92_cohort_retention" -> q92_cohort_retention,
    "q117_markov_transitions" -> q117_markov_transitions,
    "q118_window_attribution" -> q118_window_attribution,
    "q126_resample_ffill" -> q126_resample_ffill,
  )
  val oracleSql: Map[String, String] = Map(
    "q61_sessionize" -> q61_sql,
    "q62_asof_join" -> q62_sql,
    "q70_zorder_scan" -> q70_sql,
    "q91_funnel" -> q91_sql,
    "q92_cohort_retention" -> q92_sql,
    "q117_markov_transitions" -> q117_sql,
    "q118_window_attribution" -> q118_sql,
    "q126_resample_ffill" -> q126_sql,
  )
}
