package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the cell model.
  *
  * The reference is batch-only (SURVEY §2.10) — this is capability upside
  * the Spark-first design gets for free, and the reason the batch operators
  * are plain DataFrame transforms: the same column logic runs under
  * `readStream` unchanged.
  *
  * Two canonical shapes:
  *  - windowed event aggregation with a watermark (late data bounded,
  *    state auto-evicted) — the streaming analog of the gather+reduce job;
  *  - `mostRecentStream`: per-cell newest-version state via
  *    `flatMapGroupsWithState` — the streaming materialization of
  *    `EntityTable.mostRecent`, emitting an update whenever a newer
  *    version of a cell arrives (out-of-order puts are ignored, exactly
  *    HBase's newest-ts-wins resolution).
  */
object StreamingCells {

  final case class CellPutEvent(entity_id: Long, family: String,
                                qualifier: String, ts: Timestamp, value: Double)
  final case class CellLatest(entity_id: Long, family: String,
                              qualifier: String, ts: Timestamp, value: Double)

  /** Streaming exact dedup over a document stream: the batch
    * fingerprint-cluster dedup (`graft.operators.Dedup.exactClusters`)
    * re-expressed for `readStream` — duplicates of a fingerprint arriving
    * within the watermark window are dropped, and the dedup state is
    * EVICTED once the watermark passes (bounded state; an unbounded
    * `dropDuplicates` would grow state forever on a 100 TB/day feed). */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dup detection against a static reference corpus — the
    * online half of the batch MinHash-LSH dedup: each incoming document is
    * shingle-hashed and banded with the SAME native kernels as the batch
    * pipeline, joined to the corpus's precomputed banded signatures on the
    * (band, band-key) pair — a stream-static equi-join, planned per
    * micro-batch — and candidates rerank by exact Jaccard with the
    * early-abort merge. Emits (doc id, corpus doc id, jaccard) for matches
    * at or above the threshold.
    *
    * Build `corpusBanded` once offline with
    * `Dedup.bandedSignatures(hashedGrams, k, bands)` and persist it; at
    * 100 TB the stream side stays tiny per batch while the static side is
    * partitioned on the band key. A pair matching in several bands emits
    * once per matching band — follow with
    * `dropDuplicatesWithinWatermark` when exactly-once pairs matter
    * (unbounded `dropDuplicates` would grow state forever).
    */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
                    corpusBanded: DataFrame, shingleN: Int, numHashes: Int,
                    bands: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    import org.apache.spark.sql.types.DoubleType
    val hashed = docs.select(col(idCol).as("id"),
      columnOf(graft.plans.WordShingleHashes(
        expressionOf(col(textCol)), shingleN, 7)).as("ghash"))
    val streamBanded = graft.operators.Dedup
      .bandedSignatures(hashed, numHashes, bands)
    val inter = columnOf(graft.plans.SortedIntersectSize(
      expressionOf(col("s.ghash")), expressionOf(col("c.ghash")),
      if (threshold > 0) Some(threshold) else None))
    streamBanded.as("s")
      .join(corpusBanded.as("c"),
        col("s.band") === col("c.band") && col("s.bkey") === col("c.bkey") &&
          col("s.id") =!= col("c.id"))
      .select(col("s.id").as("doc_id"), col("c.id").as("corpus_doc_id"),
        (inter.cast(DoubleType) /
          (size(col("s.ghash")) + size(col("c.ghash")) - inter)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Stream-serve a persisted/loaded banded LSH index: the production
    * ingestion loop — the corpus index is built ONCE
    * (`Dedup.bandedSignaturesTiled` → `saveLshIndex`), and a stream of
    * document micro-batches probes it. Each micro-batch runs the EXACT
    * batch serve path (`Dedup.incrementalLshPairsIndexed`: delta-scaled
    * tiled probe against degenerate corpus buckets, size-ratio prefilter,
    * early-abort Jaccard rerank, per-batch distinct), so the union of the
    * streamed results over any batch split equals one batch run over the
    * union of the documents — StreamingCellsSpec pins that equality.
    * `sink` receives each batch's (new_doc, dup_of, jaccard) matches AND
    * the micro-batch id — an exactly-once sink must key its output on
    * that id (e.g. an overwrite of a `batch=<id>` partition), because
    * foreachBatch is AT-LEAST-ONCE: a crash between the sink write and
    * the checkpoint commit replays the batch on restart, and a blind
    * append would duplicate its rows. Start the returned writer (pick
    * trigger/checkpoint at the call site — `Trigger.AvailableNow` makes
    * one invocation drain the backlog and stop, the CLI
    * `index-serve stream=true` shape). */
  def lshServeStream(docs: DataFrame, idCol: String, textCol: String,
                     corpusIndex: DataFrame, shingleN: Int, numHashes: Int,
                     bands: Int, threshold: Double)
                    (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val hashed = batch.select(col(idCol).as("id"),
          columnOf(graft.plans.WordShingleHashes(
            expressionOf(col(textCol)), shingleN, 7)).as("ghash"))
        sink(graft.operators.Dedup.incrementalLshPairsIndexed(
          hashed, corpusIndex, numHashes, bands, threshold), batchId)
    }
  }

  /** Stream-serve a persisted/loaded hierarchical-SemDeDup index
    * ([[graft.operators.Clustering.SemIndex]]): the semantic-dedup
    * ingestion loop — the index is fitted ONCE
    * (`Clustering.semDedupHierFit` → `saveSemIndex`), and a stream of
    * embedding micro-batches prunes against it. Each micro-batch runs
    * the EXACT batch serve path (`Clustering.semDedupDeltaHier`: coarse
    * lane assignment, grouped-seed fine argmin, corpus-width subcell,
    * within-cell cosine vs corpus rows only), and because every delta
    * row pairs ONLY with corpus rows — never with other delta rows —
    * the union of streamed results over any batch split equals one
    * batch serve over the union (StreamingCellsSpec pins the equality).
    * Sink contract is [[lshServeStream]]'s: foreachBatch is
    * at-least-once, so key the output on the batch id. */
  def semDedupServeStream(deltas: DataFrame, idCol: String, vecCol: String,
                          idx: graft.operators.Clustering.SemIndex,
                          minCosine: Double)
                         (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    deltas.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        sink(graft.operators.Clustering.semDedupDeltaHier(
          batch, idCol, vecCol, idx, minCosine), batchId)
    }

  /** Stream-serve semantic benchmark decontamination
    * ([[graft.operators.Similarity.semanticDecontam]]): the admission
    * screen of an ingestion pipeline — the held-out eval suite is
    * persisted ONCE (`index-build --type=decontam`), and a stream of
    * candidate-embedding micro-batches flags arrivals whose cosine
    * against ANY eval vector reaches `minCosine`. Each batch runs the
    * exact batch path, and because every row is flagged independently
    * (no row-row interaction), the union of streamed results over any
    * batch split equals one batch serve over the union
    * (StreamingCellsSpec pins the equality). Sink contract is
    * [[lshServeStream]]'s: foreachBatch is at-least-once, so key the
    * output on the batch id. */
  def decontamServeStream(candidates: DataFrame, idCol: String,
                          vecCol: String, bench: DataFrame,
                          minCosine: Double)
                         (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    candidates.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        sink(graft.operators.Similarity.semanticDecontam(
          batch, bench, idCol, vecCol, minCosine), batchId)
    }

  /** Tumbling-window counts/sums per qualifier with a watermark. */
  def windowedAgg(puts: DataFrame, window: String, watermark: String): DataFrame =
    puts
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("qualifier"))
      .agg(count(lit(1)).as("n_puts"), sum(col("value")).as("sum_value"))

  /** Stream cell puts into a LIVE entity table: each micro-batch appends
    * through the direct-write path (the streaming face of
    * `DirectKijiTableWriterContext` — buffered puts flushed per batch).
    * Readers resolve versions newest-ts-wins at read time exactly as for
    * batch direct writes; compact with `EntityTable.applyChanges` /
    * `majorCompact` when the appended file count grows. The checkpoint
    * gives at-least-once appends (duplicate cell versions collapse under
    * most-recent reads). */
  def appendStream(puts: DataFrame, tablePath: String,
                   checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // Same cell-shape gate as every batch table-writing path: a mis-shaped
    // stream would otherwise append schema-divergent parquet into the live
    // table and poison every later read.
    val need = Seq("entity_id", "family", "qualifier", "ts", "value")
    require(need.forall(puts.columns.contains),
      s"appendStream needs cell columns ${need.mkString("(", ", ", ")")}, " +
        s"got ${puts.columns.mkString("(", ", ", ")")}")
    puts.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sinks.DirectSink.append(batch.toDF(), tablePath)
      }
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Stream cell puts into a table's MERGE-ON-READ change feed instead of
    * its base files: each micro-batch becomes an O(batch) `appendChanges`
    * of op='put' records, so streamed puts and batch DML tombstones
    * compose under one timestamp-ordered merge — a tombstone with ts >= a
    * streamed put's ts masks it whether it arrived before or after (HBase
    * resolves purely by (key, timestamp), not arrival order), and the
    * table's base file layout stays in pristine range-partitioned bulk
    * order until `majorCompact` folds the feed in. Prefer this over
    * `appendStream` when the table also takes deletes. */
  def appendChangeStream(puts: DataFrame, table: graft.table.EntityTable,
                         checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val need = Seq("entity_id", "family", "qualifier", "ts", "value")
    require(need.forall(puts.columns.contains),
      s"appendChangeStream needs cell columns ${need.mkString("(", ", ", ")")}, " +
        s"got ${puts.columns.mkString("(", ", ", ")")}")
    puts.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        table.appendChanges(batch.toDF().withColumn("op", lit("put")))
      }
      .outputMode(OutputMode.Append())
      .start()
  }

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionAcc(startMs: Long, endMs: Long, nEvents: Long,
                              sumValue: Double)
  final case class SessionList(open: List[SessionAcc])
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long,
                              total_value: Double)

  /** Streaming gap-based sessionization — the online face of
    * [[graft.operators.Temporal.sessionize]] (q61).
    *
    * A session is emitted ONLY when the event-time watermark passes its
    * end + gap — never eagerly on a gap-exceeding new event. Eager closing
    * would diverge from the batch semantics: two open intervals separated
    * by more than the gap can still be BRIDGED by a late in-watermark
    * event landing between them, so the state holds a LIST of disjoint
    * open intervals per user and merges batch events into it (gap-based
    * interval merge). Expired intervals (end + gap < watermark — no
    * in-watermark event can touch them, Spark drops later-than-watermark
    * rows before the state function) are emitted and dropped either on an
    * EventTimeTimeout or piggybacked on a data batch.
    *
    * State is bounded: open intervals per ACTIVE user within the
    * watermark horizon, evicted the moment they expire.
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapMs: Long,
                       watermark: String)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    require(gapMs > 0, s"session gap must be positive: $gapMs")
    def close(uid: Long, s: SessionAcc) = SessionOut(uid,
      new Timestamp(s.startMs), new Timestamp(s.endMs), s.nEvents, s.sumValue)
    // merge a point into the gap-separated, start-ordered interval list
    def merge(open: List[SessionAcc], t: Long, v: Double): List[SessionAcc] = {
      val (before, rest) = open.span(_.endMs < t - gapMs)
      val (touching, after) = rest.span(_.startMs <= t + gapMs)
      val hit = (SessionAcc(t, t, 1L, v) :: touching)
        .reduce((a, b) => SessionAcc(math.min(a.startMs, b.startMs),
          math.max(a.endMs, b.endMs), a.nEvents + b.nEvents,
          a.sumValue + b.sumValue))
      before ::: hit :: after
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionList, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, batch, state: GroupState[SessionList]) =>
          val prior = state.getOption.map(_.open).getOrElse(Nil)
          // sort before folding: interval STRUCTURE is order-independent,
          // but the Double sumValue accumulation is not — shuffle arrival
          // order would make total_value non-reproducible across reruns
          val open = batch.toSeq.sortBy(e => (e.ts.getTime, e.value))
            .foldLeft(prior) { (acc, e) => merge(acc, e.ts.getTime, e.value) }
          val wm = state.getCurrentWatermarkMs()
          val (expired, live) = open.partition(_.endMs + gapMs < wm)
          if (live.isEmpty) state.remove()
          else {
            state.update(SessionList(live))
            // a live interval can sit exactly at end+gap == wm; the timeout
            // API requires a timestamp strictly beyond the watermark
            state.setTimeoutTimestamp(math.max(live.map(_.endMs).min + gapMs, wm + 1))
          }
          expired.sortBy(_.startMs).map(close(uid, _)).iterator
      }
  }

  /** Stream-stream interval join — the attribution shape: each left event
    * pairs with the right-stream events for the same key whose timestamp
    * lies in [left.ts − maxDelay, left.ts] (e.g. click ← impressions in
    * the preceding 10 s). Watermarks on BOTH sides are what bound the
    * join state: Spark keeps a right row only until the left watermark
    * passes its timestamp + maxDelay, then evicts — without the interval
    * bound a stream-stream join would buffer both streams forever.
    *
    * Column names must be disjoint apart from `keyCol` (the caller
    * renames); the right key column is dropped from the output.
    */
  def intervalJoinStreams(left: DataFrame, right: DataFrame, keyCol: String,
                          leftTsCol: String, rightTsCol: String,
                          watermark: String, maxDelay: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"non-key columns collide: ${overlap.mkString(", ")} — rename one side")
    val l = left.withWatermark(leftTsCol, watermark).alias("l")
    val r = right.withWatermark(rightTsCol, watermark).alias("r")
    l.join(r, expr(
        s"l.$keyCol = r.$keyCol AND " +
          s"r.$rightTsCol >= l.$leftTsCol - INTERVAL $maxDelay AND " +
          s"r.$rightTsCol <= l.$leftTsCol"))
      .drop(col(s"r.$keyCol"))
  }

  /** Newest-version-wins cell state: emits one update per put that
    * advances its cell's timestamp; stale (out-of-order) puts emit
    * nothing. State is one row per live cell. */
  def mostRecentStream(puts: Dataset[CellPutEvent])(
      implicit spark: SparkSession): Dataset[CellLatest] = {
    import spark.implicits._
    puts
      .groupByKey(p => (p.entity_id, p.family, p.qualifier))
      .flatMapGroupsWithState[CellLatest, CellLatest](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((eid, fam, qual), events, state: GroupState[CellLatest]) =>
          // Buffering is bounded: one trigger's puts for ONE cell key
          // (events is per-group per-batch), not the whole stream.
          val incoming = events.toSeq
          if (incoming.isEmpty) Iterator.empty
          else {
            val newest = incoming.maxBy(p => (p.ts.getTime, p.value))
            val current = state.getOption
            // `<=`, not `<`: an equal-timestamp put overwrites, matching
            // HBase's last-write-wins at the same cell version.
            if (current.forall(_.ts.getTime <= newest.ts.getTime)) {
              val latest = CellLatest(eid, fam, qual, newest.ts, newest.value)
              state.update(latest)
              Iterator.single(latest)
            } else Iterator.empty
          }
      }
  }
}
