package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def evs(rows: (Long, Long, Long)*) = // (user, microTs, id)
    rows.toSeq.toDF("user_id", "us", "event_id")
      .select($"user_id", timestamp_micros($"us").as("ts"), $"event_id")

  test("sessionize: gap boundary is exclusive, keys are independent") {
    val gap = 100L
    val df = evs(
      (1L, 0L, 10L), (1L, 100L, 11L),  // diff == gap: SAME session
      (1L, 201L, 12L),                 // diff  > gap: new session
      (2L, 1000L, 20L))                // other key starts at 1
    val out = Temporal.sessionize(df, "user_id", "ts", gap, "event_id")
      .select($"event_id", $"session_idx")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 20L -> 1L))
  }

  test("sessionize: equal timestamps are ordered by the tiebreak column") {
    // two rows at the same instant never split a session between them,
    // and assignment is identical through any repartition
    val df = evs((1L, 0L, 2L), (1L, 0L, 1L), (1L, 500L, 3L))
    def run(d: org.apache.spark.sql.DataFrame) =
      Temporal.sessionize(d, "user_id", "ts", 100L, "event_id")
        .select($"event_id", $"session_idx")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(df)
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    assert(run(df.repartition(5)) == a)
    // reserved output column is refused, not clobbered
    intercept[IllegalArgumentException] {
      Temporal.sessionize(df.withColumn("session_idx", lit(9)),
        "user_id", "ts", 100L, "event_id")
    }
  }

  test("asOfJoin: inclusive most-recent-prior match, left-outer semantics") {
    val left = evs((1L, 50L, 101L), (1L, 100L, 102L), (1L, 5L, 100L),
      (2L, 50L, 200L))
    val right = Seq((1L, 10L, 900L, 1.5), (1L, 100L, 901L, 2.5))
      .toDF("user_id", "us", "rid", "rval")
      .select($"user_id", timestamp_micros($"us").as("ts"), $"rid", $"rval")
    val out = Temporal.asOfJoin(left, right, "user_id", "ts", "ts",
        Seq("rid", "rval"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4))))).toMap
    assert(out(100L).isEmpty)                  // ts=5: before any right row
    assert(out(101L).contains((900L, 1.5)))    // ts=50: rid 900 at ts=10
    assert(out(102L).contains((901L, 2.5)))    // ts=100: INCLUSIVE equal-ts
    assert(out(200L).isEmpty)                  // key 2 has no right rows
    // left row count and columns are preserved exactly
    val cols = Temporal.asOfJoin(left, right, "user_id", "ts", "ts",
      Seq("rid", "rval"))
    assert(cols.columns.toSeq ==
      Seq("user_id", "ts", "event_id", "rid", "rval"))
    assert(cols.count() == left.count())
  }

  test("asOfJoin: right ties on (key, ts) resolve deterministically") {
    val left = evs((1L, 100L, 1L))
    val right = Seq((1L, 10L, 7L, 0.0), (1L, 10L, 9L, 0.0), (1L, 10L, 8L, 0.0))
      .toDF("user_id", "us", "rid", "rval")
      .select($"user_id", timestamp_micros($"us").as("ts"), $"rid", $"rval")
    def run() = Temporal.asOfJoin(left, right.repartition(3), "user_id",
      "ts", "ts", Seq("rid", "rval")).collect().head.getLong(3)
    val first = run()
    assert(first == 9L) // greatest payload struct wins
    assert((1 to 3).forall(_ => run() == first))
    // payload names colliding with left columns are refused
    intercept[IllegalArgumentException] {
      Temporal.asOfJoin(left, right.withColumnRenamed("rid", "event_id"),
        "user_id", "ts", "ts", Seq("event_id"))
    }
  }

  test("funnel: time-ordered progression, not event presence") {
    def fevs(rows: (Long, Long, String)*) =
      rows.toSeq.toDF("user_id", "us", "event_type")
        .select($"user_id", timestamp_micros($"us").as("ts"), $"event_type")
    val events = fevs(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full
      // user 2's only click PRECEDES the first view: presence of all three
      // types must NOT count as conversion — stops at view
      (2L, 5L, "click"), (2L, 10L, "view"), (2L, 20L, "purchase"),
      (3L, 10L, "view"),                                            // view only
      (4L, 50L, "purchase"))                                        // no view: unreached
    val out = Temporal.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.getTimestamp(4)).map(_ => r.getTimestamp(4).getTime)))
    val byStage = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStage(0) == Set(1L, 2L, 3L)) // user 4 never views
    assert(byStage(1) == Set(1L))         // only user 1 clicks after viewing
    assert(byStage(2) == Set(1L))
    // prev_ts: null at stage 0, populated later
    assert(out.filter(_._2 == 0).forall(_._3.isEmpty))
    assert(out.filter(_._2 > 0).forall(_._3.nonEmpty))
    // strict ordering: a click AT the view instant does not advance
    val tied = Temporal.funnel(
      fevs((9L, 10L, "view"), (9L, 10L, "click")),
      "user_id", "ts", "event_type", Seq("view", "click"))
      .collect().map(_.getInt(1))
    assert(tied.toSeq == Seq(0))
    intercept[IllegalArgumentException] {
      Temporal.funnel(events, "user_id", "ts", "event_type", Seq())
    }
    intercept[IllegalArgumentException] {
      Temporal.funnel(events, "user_id", "ts", "event_type", Seq("a", "a"))
    }
  }

  test("transitionCounts: consecutive pairs within a partition only") {
    val df = Seq(
      // user 1, session 1: a -> b -> a
      (1L, 1L, 1L, "a"), (1L, 1L, 2L, "b"), (1L, 1L, 3L, "a"),
      // user 1, session 2: b -> b  (no cross-session a->b pair!)
      (1L, 2L, 4L, "b"), (1L, 2L, 5L, "b"),
      // user 2, session 1: single event, no transition
      (2L, 1L, 6L, "c"))
      .toDF("user_id", "session_idx", "event_id", "state")
    val out = Temporal.transitionCounts(df,
        Seq("user_id", "session_idx"), Seq("event_id"), "state")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "b") -> 1L))
  }

  test("recentWindowAgg: [ts-W, ts) bounds, bucket-edge crossing, zero rows") {
    val W = 100L
    val left = Seq(
      (1L, 7L, 150L),  // bucket 1: matches must reach back into bucket 0
      (2L, 7L, 300L),
      (3L, 8L, 150L))  // other key: must see nothing
      .toDF("id", "k", "us")
      .select($"id", $"k", timestamp_micros($"us").as("ts"))
    val right = Seq(
      (7L, 50L, 1.0),   // = 150-100: INCLUDED for id 1 (inclusive lower)
      (7L, 60L, 2.0),   // bucket 0, inside id 1's window across the edge
      (7L, 150L, 4.0),  // = id 1's own ts: EXCLUDED (exclusive upper)
      (7L, 299L, 8.0))  // inside id 2's window only
      .toDF("k", "rus", "v")
      .select($"k", timestamp_micros($"rus").as("rts"), $"v")
    val out = Temporal.recentWindowAgg(left, right, "k", "id", "ts", "rts",
        W, "v").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_in_window"), r.getAs[Double]("win_value")))).toMap
    assert(out(1L) == ((2L, 3.0))) // 1.0 + 2.0; the rts=150 row excluded
    assert(out(2L) == ((1L, 8.0))) // only rts=299 is in [200, 300)
    assert(out(3L) == ((0L, 0.0)))
  }

  test("transitionCounts: order column decides direction deterministically") {
    val df = Seq((1L, 10L, "x"), (1L, 5L, "y")).toDF("u", "ord", "state")
    val out = Temporal.transitionCounts(df, Seq("u"), Seq("ord"), "state")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("y", "x"))) // ord ascending: y (5) precedes x (10)
  }
}
