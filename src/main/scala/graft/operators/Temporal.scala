package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over event streams: gap-based sessionization and the
  * as-of (most-recent-prior) join.
  *
  * The reference engine has neither (kiji-mapreduce expresses temporal logic
  * as per-row gatherer code over versioned cells, e.g.
  * kiji-mapreduce/src/main/java/org/kiji/mapreduce/gather/GathererContext.java);
  * these are the declarative Spark-first equivalents a training-data /
  * clickstream pipeline needs.
  *
  * Scale shape: both operators are ONE shuffle on the key column followed by
  * a per-partition sort — exactly the sort-merge plan a 1000-executor
  * cluster wants. No broadcast of the full right side, no range-explosion
  * join, no driver-side state.
  */
object Temporal {

  /** Gap-based sessionization: rows for the same `keyCol` whose `tsCol`
    * values are more than `gapMicros` apart start a new session. Appends a
    * per-key `session_idx` (1-based, dense) to the input rows.
    *
    * `tiebreakCol` makes the intra-key order total when timestamps collide,
    * so the session assignment is deterministic and reproducible run-to-run
    * — a requirement for training-data lineage.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapMicros: Long, tiebreakCol: String): DataFrame = {
    require(gapMicros > 0, s"session gap must be positive: $gapMicros")
    Seq("session_idx", "__is_new").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column (reserved for the sessionizer)")
    }
    val ord = Seq(col(tsCol), col(tiebreakCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    df.withColumn("__is_new",
        when(prev.isNull || unix_micros(col(tsCol)) - prev > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__is_new")).over(run))
      .drop("__is_new")
  }

  /** Sliding-window range aggregation via a BUCKETED equi-join — for every
    * left row, the count and exact decimal sum of right rows with the same
    * key whose timestamp falls in `[leftTs − window, leftTs)` (strictly
    * before the left event). The attribution shape: "purchases in the 7
    * days before this click".
    *
    * A naive `l.ts − W <= r.ts AND r.ts < l.ts` range join explodes to
    * |L|·|R| candidate pairs per key before filtering. Bucketing by
    * `floor(ts / window)` instead makes it an EQUI-join Catalyst can hash:
    * a right row in bucket b can only match left rows in buckets b or b+1,
    * so the right side replicates exactly 2× and candidates are bounded by
    * per-key density × 2·window — never the full per-key cross product.
    * At 100 TB both sides shuffle once on (key, bucket); AQE's skew
    * handling applies as with any hash join.
    *
    * Output: every left row (left-outer: zero matches → 0 / 0.0) plus
    * `n_in_window` and `win_value` (sum of `valueCol` over matches,
    * decimal-exact then surfaced as double — addition-order-free, see
    * `graft.queries.Num`).
    *
    * @param leftIdCol unique left row id (re-aggregation key)
    */
  def recentWindowAgg(left: DataFrame, right: DataFrame, keyCol: String,
                      leftIdCol: String, leftTsCol: String,
                      rightTsCol: String, windowMicros: Long,
                      valueCol: String, valueScale: Int = 6): DataFrame = {
    require(windowMicros > 0, s"window must be positive: $windowMicros")
    val lb = left
      .withColumn("__lus", unix_micros(col(leftTsCol)))
      .withColumn("__b", expr(s"__lus div ${windowMicros}L"))
    val rb = right
      .withColumn("__rus", unix_micros(col(rightTsCol)))
      .withColumn("__rb", expr(s"__rus div ${windowMicros}L"))
      .withColumn("__b", explode(array(col("__rb"), col("__rb") + 1L)))
    val matches = lb.select(col(leftIdCol).as("__lid"), col(keyCol).as("__k"),
        col("__lus"), col("__b"))
      .join(rb.select(col(keyCol).as("__k"), col("__b"), col("__rus"),
        col(valueCol).as("__v")), Seq("__k", "__b"))
      .filter(col("__rus") >= col("__lus") - windowMicros &&
        col("__rus") < col("__lus"))
      .groupBy(col("__lid"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__v").cast(org.apache.spark.sql.types.DecimalType(30, valueScale)))
          .cast(org.apache.spark.sql.types.DoubleType).as("__sum"))
    left.join(matches, left(leftIdCol) === matches("__lid"), "left")
      .drop("__lid")
      .withColumn("n_in_window", coalesce(col("__n"), lit(0L)))
      .withColumn("win_value", coalesce(col("__sum"), lit(0.0)))
      .drop("__n", "__sum")
  }

  /** First-order transition counts over a partitioned ordered stream —
    * the Markov-chain statistics of sessionized behavior (what follows
    * what within a session), the sequence-mining counterpart of q91's
    * funnel. Each partition's consecutive `stateCol` pairs are counted:
    * (from_state, to_state, n).
    *
    * Scale shape: ONE window (lag 1) co-partitioned on the session keys
    * — the same shuffle the sessionizer already made, so Catalyst reuses
    * the partitioning — followed by a bounded aggregation (|states|²
    * rows out regardless of corpus size, full map-side combine). The
    * tiebreak order must be total for run-to-run determinism, exactly as
    * in [[sessionize]].
    */
  def transitionCounts(df: DataFrame, partitionCols: Seq[String],
                       orderCols: Seq[String], stateCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_state"), col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  /** As-of join: for every left row, attach `payloadCols` from the single
    * right row with the same `keyCol` and the greatest `rightTsCol` that is
    * <= the left row's `leftTsCol` (inclusive match on equal timestamps,
    * like DuckDB/kdb ASOF JOIN). Left rows with no prior right row keep
    * null payload columns (left-outer semantics).
    *
    * Implementation is the union trick, not a range join: tag both sides,
    * union, and take `last(payload, ignoreNulls)` over a
    * (key, ts, side, payload)-ordered running window. One shuffle, no
    * candidate explosion — at 100 TB this is a single sort-merge pass,
    * whereas a `leftTs >= rightTs` range join would build |L|x|R| candidate
    * pairs per key before picking the max.
    *
    * Right rows that collide on (key, ts) resolve to the greatest payload
    * struct (field-order comparison) so the result is deterministic.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "asOfJoin needs at least one payload column")
    payloadCols.foreach { c =>
      require(!left.columns.contains(c),
        s"payload column $c collides with a left column; alias it on the right side")
    }
    val r = right.select(
      col(keyCol).as("__k"), col(rightTsCol).as("__t"), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__p"))
    val l = left.select(
      col(keyCol).as("__k"), col(leftTsCol).as("__t"), lit(1).as("__side"),
      lit(null).cast(r.schema("__p").dataType).as("__p"),
      struct(left.columns.toSeq.map(col): _*).as("__l"))
    val u = l.unionByName(
      r.withColumn("__l", lit(null).cast(l.schema("__l").dataType)))
    // side=0 sorts before side=1 at equal ts, so a right row AT the left
    // row's timestamp is visible to it (inclusive as-of).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.toSeq.map(c => col(s"__l.$c")) ++
        payloadCols.map(c => col(s"__m.$c")): _*)
  }

  /** Ordered funnel: per user, the earliest stage-1 event, the earliest
    * stage-2 event STRICTLY AFTER it, and so on — the standard product
    * funnel (view → click → purchase) with progression enforced by event
    * time, not mere presence.
    *
    * Scale shape: stage i is one filtered partial-agg `min(ts)` per user
    * joined against stage i−1's (user, ts) frame — every step is a
    * co-partitioned hash join + agg on the user key (AQE broadcasts the
    * later, smaller stage frames), never a per-user window over the whole
    * event stream. `stages.size` is small and static, so the chain is a
    * fixed pipeline, not an iteration over data.
    *
    * @return long-form rows (userCol, stage_idx, stage, stage_ts,
    *         prev_ts) for every reached stage; `prev_ts` is null at
    *         stage 0 — the per-stage conversion lag is
    *         `stage_ts − prev_ts`.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct: $stages")
    Seq("stage_idx", "stage", "stage_ts", "prev_ts", "__pt").foreach { c =>
      require(!events.columns.contains(c),
        s"input already has a $c column (reserved for the funnel)")
    }
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("stage_ts"))
      .select(col(userCol), lit(0).as("stage_idx"),
        lit(stages.head).as("stage"), col("stage_ts"),
        lit(null).cast(events.schema(tsCol).dataType).as("prev_ts"))
    stages.zipWithIndex.tail
      .scanLeft(first) { case (prev, (stage, i)) =>
        events.filter(col(typeCol) === stage)
          .join(prev.select(col(userCol), col("stage_ts").as("__pt")), userCol)
          .filter(col(tsCol) > col("__pt"))
          .groupBy(col(userCol))
          .agg(min(col(tsCol)).as("stage_ts"), min(col("__pt")).as("prev_ts"))
          .select(col(userCol), lit(i).as("stage_idx"), lit(stage).as("stage"),
            col("stage_ts"), col("prev_ts"))
      }
      .reduce(_.union(_))
  }
}
