package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamingCells._

class StreamingCellsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("mostRecentStream: newest version wins; out-of-order puts ignored") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CellPutEvent]
    val q = mostRecentStream(input.toDS())
      .writeStream.format("memory").queryName("latest_cells")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        CellPutEvent(1L, "ev", "click", ts(10), 1.0),
        CellPutEvent(1L, "ev", "click", ts(30), 3.0))
      q.processAllAvailable()
      // late, older put: must NOT emit
      input.addData(CellPutEvent(1L, "ev", "click", ts(20), 2.0))
      q.processAllAvailable()
      // newer put: emits an update
      input.addData(CellPutEvent(1L, "ev", "click", ts(40), 4.0))
      q.processAllAvailable()
      // equal-timestamp put: overwrites (HBase last-write-wins)
      input.addData(CellPutEvent(1L, "ev", "click", ts(40), 4.5))
      q.processAllAvailable()
      val emitted = spark.table("latest_cells")
        .select("ts", "value").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getDouble(1))).toList
      assert(emitted == List((30L, 3.0), (40L, 4.0), (40L, 4.5)))
    } finally q.stop()
  }

  test("dedupStream: duplicate fingerprints within the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingCells.dedupStream(
        input.toDS().toDF("doc_id", "text", "ts"), "text", "ts", "10 seconds")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "the quick brown fox", ts(10)),
        (2L, "The  quick   BROWN fox", ts(11)), // whitespace/case dup of 1
        (3L, "something else", ts(12)))
      q.processAllAvailable()
      input.addData((4L, "the quick brown fox", ts(13))) // dup, in window
      q.processAllAvailable()
      val ids = spark.table("deduped").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("bpe kernel token-counts a document stream (pure column expr, no state)") {
    // The inference-side tokenizer (graft.plans.BpeDocStats) is a plain
    // codegen'd expression, so it composes with streaming for free —
    // per-batch token accounting with no state store, the shape a
    // streaming ingest pipeline uses to meter token budgets on arrival.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val lhs = Array("l", "lo")
    val rhs = Array("o", "w")
    val input = MemoryStream[(Long, String)]
    val stats = input.toDS().toDF("doc_id", "text")
      .select($"doc_id",
        columnOf(graft.plans.BpeDocStats(expressionOf($"text"), lhs, rhs)).as("st"))
      .select($"doc_id",
        org.apache.spark.sql.functions.element_at($"st", 1).as("n_words"),
        org.apache.spark.sql.functions.element_at($"st", 2).as("n_tokens"))
    val q = stats.writeStream.format("memory").queryName("bpe_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "low low"), (2L, "lot"))
      q.processAllAvailable()
      val got = spark.table("bpe_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // "low" -> l o w -> lo w -> low = 1 token; "lot" -> lo t = 2 tokens
      assert(got == Set((1L, 2L, 2L), (2L, 1L, 2L)))
    } finally q.stop()
  }

  test("nearDupStream: incoming docs match the static corpus via banded LSH") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    // Static corpus side: banded signatures built once, as a user would.
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "an entirely different reference document about spark"))
      .toDF("doc_id", "text")
    val corpusHashed = corpus.select(col("doc_id").as("id"),
      columnOf(graft.plans.WordShingleHashes(
        expressionOf(col("text")), 3, 7)).as("ghash"))
    val corpusBanded = graft.operators.Dedup
      .bandedSignatures(corpusHashed, 16, 4).cache()
    val input = MemoryStream[(Long, String)]
    val q = StreamingCells.nearDupStream(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text",
        corpusBanded, shingleN = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .writeStream.format("memory").queryName("neardup_matches")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 100
        (2L, "completely unrelated text with no overlap at all"))
      q.processAllAvailable()
      val matches = spark.table("neardup_matches")
        .select("doc_id", "corpus_doc_id", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // doc 1 matches corpus 100 at jaccard 1.0 (possibly once per band,
      // hence the toSet); doc 2 matches nothing
      assert(matches == Set((1L, 100L, 1.0)))
    } finally { q.stop(); corpusBanded.unpersist() }
  }

  test("nearDupStream serves from a PERSISTED index: save, load, probe") {
    // the production ingestion shape end-to-end: the corpus's banded
    // index is built once and saved as parquet (Dedup.saveLshIndex, the
    // q110 artifact); the stream probes the LOADED index — no corpus
    // signatures recomputed per batch, and a restart only re-reads
    // parquet.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "an entirely different reference document about spark"))
      .toDF("doc_id", "text")
    val corpusHashed = corpus.select(col("doc_id").as("id"),
      columnOf(graft.plans.WordShingleHashes(
        expressionOf(col("text")), 3, 7)).as("ghash"))
    val path = tmpDir("lsh_stream_index")
    graft.operators.Dedup.saveLshIndex(
      graft.operators.Dedup.bandedSignatures(corpusHashed, 16, 4), path)
    val loaded = graft.operators.Dedup.loadLshIndex(spark, path)
    val input = MemoryStream[(Long, String)]
    val q = StreamingCells.nearDupStream(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text",
        loaded, shingleN = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .writeStream.format("memory").queryName("neardup_from_index")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely unrelated text with no overlap at all"))
      q.processAllAvailable()
      val matches = spark.table("neardup_from_index")
        .select("doc_id", "corpus_doc_id", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(matches == Set((1L, 100L, 1.0)))
    } finally q.stop()
  }

  test("lshServeStream: streamed micro-batches == one batch serve over the union") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftbridge.ColumnBridge.{columnOf, expressionOf}
    def hashed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("id"),
        columnOf(graft.plans.WordShingleHashes(
          expressionOf(col("text")), 3, 7)).as("ghash"))
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "an entirely different reference document about spark"),
      (102L, "pack the shards and ship the manifest tonight"))
      .toDF("doc_id", "text")
    // tiled index — the q110/index-build artifact shape
    val index = graft.operators.Dedup
      .bandedSignaturesTiled(hashed(corpus), 16, 4).cache()
    val deltas = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // dup of 100
      (2L, "completely unrelated text with no overlap at all"),
      (3L, "pack the shards and ship the manifest tonight"), // dup of 102
      (4L, "another stray document matching nothing here"))
      .toDF("doc_id", "text")
    // batch reference: ONE serve over all four docs
    val want = graft.operators.Dedup.incrementalLshPairsIndexed(
        hashed(deltas), index, 16, 4, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.map(p => (p._1, p._2)) == Set((1L, 100L), (3L, 102L)))
    // streamed: the same four docs in TWO micro-batches through the
    // foreachBatch serve loop — accumulated matches must be identical
    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val input = MemoryStream[(Long, String)]
    val q = StreamingCells.lshServeStream(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text",
        index, shingleN = 3, numHashes = 16, bands = 4, threshold = 0.8) {
        (batchOut, _) => got ++= batchOut.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }.start()
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely unrelated text with no overlap at all"))
      q.processAllAvailable()
      input.addData((3L, "pack the shards and ship the manifest tonight"),
        (4L, "another stray document matching nothing here"))
      q.processAllAvailable()
      assert(got.toSet == want)
    } finally { q.stop(); index.unpersist() }
  }

  test("streaming SemDeDup: micro-batch deltas prune against the static corpus") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // Ingestion-time semantic dedup: each arriving micro-batch is a delta
    // pruned against the fixed corpus (Clustering.semDedupDelta inside
    // foreachBatch — the streaming face of q105). Identical vectors
    // always co-cluster, so the expected prune set is deterministic.
    val corpus = Seq(
      (0L, Seq(10f, 1f, 0f, 0f)), (1L, Seq(0f, 0f, 10f, 1f)),
      (2L, Seq(10f, 1f, 0f, 0f)), (3L, Seq(0f, 0f, 10f, -1f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val input = MemoryStream[(Long, Seq[Float])]
    val results = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val q = input.toDS().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        results.synchronized {
          results ++= graft.operators.Clustering
            .semDedupDelta(batch, corpus, "vec_id", "embedding",
              k = 2, iters = 2, minCosine = 0.999)
            .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
        }
        (): Unit
      }
      .start()
    try {
      input.addData(
        (10L, Seq(10f, 1f, 0f, 0f)),   // identical to corpus 0/2 → pruned
        (11L, Seq(0f, 0f, -10f, 5f)))  // similar to nothing → kept
      q.processAllAvailable()
      input.addData((12L, Seq(0f, 0f, 10f, 1f))) // identical to corpus 1
      q.processAllAvailable()
      assert(results.toSet == Set((10L, 0L, 1.0), (12L, 1L, 1.0)),
        results.mkString(", "))
    } finally q.stop()
  }

  test("semDedupServeStream: streamed micro-batches == one batch serve from the loaded index") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.operators.Clustering
    // the q138/q139 artifact: fit ONCE, then a stream of delta batches
    // prunes against it through the exact batch path (semDedupDeltaHier —
    // delta rows pair only with CORPUS rows, so any batch split composes)
    val corpus = Seq(
      (0L, Seq(10f, 1f, 0f, 0f)), (1L, Seq(0f, 0f, 10f, 1f)),
      (2L, Seq(-10f, 1f, 0f, 0f)), (3L, Seq(0f, 0f, 10f, -1f)),
      (4L, Seq(7f, -7f, 1f, 0f)), (5L, Seq(1f, 0f, -9f, 3f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val idx = Clustering.semDedupHierFit(corpus, "vec_id", "embedding",
      coarseK = 2, targetRows = 2L, iters = 2)
    val deltas = Seq(
      (100L, Seq(10f, 1f, 0f, 0f)),  // dup of corpus 0
      (101L, Seq(0f, 0f, 10f, 1f)),  // dup of corpus 1
      (102L, Seq(2f, -5f, 3f, 2f)),  // matches nothing
      (103L, Seq(0f, 0f, 10f, -1f))) // dup of corpus 3
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    try {
      // batch reference: ONE delta serve over all four vectors
      val want = Clustering
        .semDedupDeltaHier(deltas, "vec_id", "embedding", idx, 0.999)
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(want.map(_._1) == Set(100L, 101L, 103L), want.mkString(", "))
      // streamed: the same four vectors in TWO micro-batches
      val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
      val input = MemoryStream[(Long, Seq[Float])]
      val q = StreamingCells.semDedupServeStream(
          input.toDS().toDF("vec_id", "embedding")
            .select(col("vec_id"),
              col("embedding").cast("array<float>").as("embedding")),
          "vec_id", "embedding", idx, 0.999) { (batchOut, _) =>
          got.synchronized {
            got ++= batchOut.collect()
              .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
          }: Unit
        }.start()
      try {
        input.addData((100L, Seq(10f, 1f, 0f, 0f)),
          (102L, Seq(2f, -5f, 3f, 2f)))
        q.processAllAvailable()
        input.addData((101L, Seq(0f, 0f, 10f, 1f)),
          (103L, Seq(0f, 0f, 10f, -1f)))
        q.processAllAvailable()
        assert(got.toSet == want, got.mkString(", "))
      } finally q.stop()
    } finally graft.operators.OperatorCaches.releaseAll()
  }

  test("decontamServeStream: streamed micro-batches == one batch screen vs the eval suite") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    def vecs(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
    // the admission screen: the eval suite is static; candidates stream
    val bench = vecs(Seq(
      (900L, Seq(10f, 1f, 0f, 0f)), (901L, Seq(0f, 0f, 10f, 1f))))
    val candidates = Seq(
      (1L, Seq(10f, 1f, 0f, 0f)),   // contaminated (matches 900)
      (2L, Seq(2f, -5f, 3f, 2f)),   // clean
      (3L, Seq(0f, 0f, 10f, 1f)),   // contaminated (matches 901)
      (4L, Seq(-7f, 2f, 0f, 1f)))   // clean
    val want = Similarity
      .semanticDecontam(vecs(candidates), bench, "vec_id", "embedding", 0.999)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.map(_._1) == Set(1L, 3L), want.mkString(", "))
    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingCells.decontamServeStream(
        input.toDS().toDF("vec_id", "embedding")
          .select(col("vec_id"),
            col("embedding").cast("array<float>").as("embedding")),
        "vec_id", "embedding", bench, 0.999) { (batchOut, _) =>
        got.synchronized {
          got ++= batchOut.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        }: Unit
      }.start()
    try {
      input.addData(candidates(0), candidates(1))
      q.processAllAvailable()
      input.addData(candidates(2), candidates(3))
      q.processAllAvailable()
      assert(got.toSet == want, got.mkString(", "))
    } finally q.stop()
  }

  test("appendStream: micro-batches land in the live table; reads resolve versions") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, unix_micros}
    import graft.table.{DataRequest, EntityTable, FamilySpec, TableLayout}
    val tableDir = tmpDir("streamtable") + "/t"
    val ckpt = tmpDir("streamckpt")
    val input = MemoryStream[CellPutEvent]
    val puts = input.toDS().toDF().select(
      col("entity_id"), col("family"), col("qualifier"),
      unix_micros(col("ts")).as("ts"), col("value"))
    val q = StreamingCells.appendStream(puts, tableDir, ckpt)
    try {
      input.addData(CellPutEvent(1L, "ev", "click", ts(10), 1.0))
      q.processAllAvailable()
      input.addData(CellPutEvent(1L, "ev", "click", ts(20), 2.0)) // second batch
      q.processAllAvailable()
      val table = new EntityTable(spark, tableDir,
        TableLayout("t", Seq(FamilySpec("ev"))))
      assert(table.cells.count() == 2) // both appended versions on disk
      val latest = table.mostRecent(DataRequest()).collect()
      assert(latest.length == 1 && latest.head.getAs[Double]("value") == 2.0)
    } finally q.stop()
  }

  test("appendChangeStream: streamed puts land in the feed; a later tombstone masks them") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, unix_micros}
    import graft.table.{EntityTable, FamilySpec, TableLayout}
    val tableDir = tmpDir("chgstream") + "/t"
    val ckpt = tmpDir("chgstreamckpt")
    val table = new EntityTable(spark, tableDir,
      TableLayout("t", Seq(FamilySpec("ev"))))
    // a bulk-loaded base the stream must NOT rewrite
    table.bulkLoad(Seq((9L, "ev", "click", 1L, 0.5))
      .toDF("entity_id", "family", "qualifier", "ts", "value"), numPartitions = 1)
    val input = MemoryStream[CellPutEvent]
    val puts = input.toDS().toDF().select(
      col("entity_id"), col("family"), col("qualifier"),
      unix_micros(col("ts")).as("ts"), col("value"))
    val q = StreamingCells.appendChangeStream(puts, table, ckpt)
    try {
      input.addData(CellPutEvent(1L, "ev", "click", ts(10), 1.0))
      q.processAllAvailable()
      input.addData(CellPutEvent(1L, "ev", "click", ts(20), 2.0)) // 2nd batch
      q.processAllAvailable()
      // both micro-batches are in the FEED (merge-on-read), base untouched
      assert(table.hasPendingChanges && table.changeFeedStats._2 == 2L)
      assert(spark.read.parquet(live(tableDir)).count() == 1) // base: the bulk row only
      assert(table.cells.count() == 3)
      // a batch tombstone with upToTs >= the streamed puts masks them,
      // regardless of arrival order (pure (key, ts) resolution)
      table.appendChanges(Seq(
        (1L, "ev", "click", "delete_column", 20L * 1000000L, null.asInstanceOf[java.lang.Double]))
        .toDF("entity_id", "family", "qualifier", "op", "ts", "value"))
      val left = table.cells.select("entity_id").collect().map(_.getLong(0)).toList
      assert(left == List(9L), s"streamed puts must be masked, saw $left")
      // ...and a stale tombstone (ts below a streamed put) does NOT mask it:
      // a put streamed AFTER the tombstone with a HIGHER ts survives
      input.addData(CellPutEvent(2L, "ev", "view", ts(50), 5.0))
      q.processAllAvailable()
      table.appendChanges(Seq(
        (2L, "ev", "view", "delete_column", 40L * 1000000L, null.asInstanceOf[java.lang.Double]))
        .toDF("entity_id", "family", "qualifier", "op", "ts", "value"))
      val ids = table.cells.select("entity_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(9L, 2L), "ts=50s put must survive a ts=40s tombstone")
    } finally q.stop()
  }

  test("windowedAgg: tumbling windows with watermark produce exact counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CellPutEvent]
    val q = windowedAgg(input.toDS().toDF(), "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("windowed")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        CellPutEvent(1L, "ev", "click", ts(1), 1.0),
        CellPutEvent(2L, "ev", "click", ts(3), 2.0),
        CellPutEvent(3L, "ev", "view", ts(12), 5.0))
      q.processAllAvailable()
      val rows = spark.table("windowed")
        .selectExpr("qualifier", "n_puts", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("intervalJoinStreams: clicks attribute to impressions within the window") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, String)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val q = intervalJoinStreams(
        clicks.toDS().toDF("user_id", "click_ts", "click_id"),
        imps.toDS().toDF("user_id", "imp_ts", "imp_id"),
        "user_id", "click_ts", "imp_ts", "30 seconds", "10 seconds")
      .writeStream.format("memory").queryName("attributed")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData((1L, ts(100), "impA"), (1L, ts(95), "impB"),
        (1L, ts(80), "impOld"), (2L, ts(100), "impC"))
      q.processAllAvailable()
      // click at 105: impA (5s before) and impB (10s, inclusive) match;
      // impOld (25s) is outside the window, impC is another user
      clicks.addData((1L, ts(105), 9001L))
      q.processAllAvailable()
      // right event arriving AFTER the click still attributes (in-watermark)
      imps.addData((1L, ts(104), "impLate"))
      q.processAllAvailable()
      val got = spark.table("attributed")
        .select("click_id", "imp_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((9001L, "impA"), (9001L, "impB"), (9001L, "impLate")))
    } finally q.stop()
  }

  test("sessionizeStream: late merge, cross-batch bridging, watermark closes") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // 10s gap, 100s lateness so late events genuinely arrive in-watermark
    val q = sessionizeStream(input.toDS(), gapMs = 10000L, watermark = "100 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    def emitted() = spark.table("sessions")
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getTimestamp(2).getTime / 1000, r.getLong(3), r.getDouble(4)))
      .toSet
    try {
      // late events in ONE batch chain backwards: 85←95←100 is one session
      input.addData(SessionEvent(1L, ts(100), 1.0),
        SessionEvent(1L, ts(95), 2.0), SessionEvent(1L, ts(85), 0.5))
      q.processAllAvailable()
      assert(emitted().isEmpty, "open session must not emit")
      // a far-future event opens a SECOND interval; nothing closes yet
      // (watermark is only 200s after this batch)
      input.addData(SessionEvent(1L, ts(300), 1.0))
      q.processAllAvailable()
      // cross-batch bridging: 285 and 295 arrive later but merge into the
      // (300,300) interval — eager closing would have emitted 285 alone.
      // Meanwhile the watermark (200s) expires the (85,100) session.
      input.addData(SessionEvent(1L, ts(285), 1.0), SessionEvent(1L, ts(295), 1.0))
      q.processAllAvailable()
      assert(emitted() == Set((1L, 85L, 100L, 3L, 3.5)))
      // other users advance the watermark; each close happens exactly when
      // the watermark passes that session's end + gap
      input.addData(SessionEvent(2L, ts(500), 9.0))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, ts(600), 1.0)) // wm 400: closes (285,300)
      q.processAllAvailable()
      input.addData(SessionEvent(2L, ts(700), 1.0)) // wm 500: (500,500) still live
      q.processAllAvailable()
      // wm 600 closes (500,500); the follow-up no-data microbatch advances
      // the watermark to 700 and times out (600,600) too
      input.addData(SessionEvent(3L, ts(800), 1.0))
      q.processAllAvailable()
      assert(emitted() == Set(
        (1L, 85L, 100L, 3L, 3.5),
        (1L, 285L, 300L, 3L, 3.0),
        (2L, 500L, 500L, 1L, 9.0),
        (2L, 600L, 600L, 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming CMS: counter grid maintains incrementally; final state = batch grid") {
    // cmsCounters is a bounded groupBy(row, pos).count — a legal streaming
    // agg in Update mode with d×w max state: the live heavy-hitter monitor
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, max}
    val input = MemoryStream[String]
    val q = graft.operators.Sketches
      .cmsCounters(input.toDS().toDF("item"), "item", d = 2, w = 64)
      .writeStream.format("memory").queryName("cms_grid")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((0 until 300).map(i => s"t${i % 30}"): _*)
      q.processAllAvailable()
      input.addData((0 until 200).map(i => s"t${i % 20}"): _*)
      q.processAllAvailable()
      // latest count per cell (Update mode re-emits a cell on each change)
      val streamed = spark.table("cms_grid")
        .groupBy(col("row"), col("pos")).agg(max(col("cnt")).as("cnt"))
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      val batch = graft.operators.Sketches
        .cmsCounters(((0 until 300).map(i => s"t${i % 30}") ++
          (0 until 200).map(i => s"t${i % 20}")).toDF("item"), "item", 2, 64)
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming HLL: registers maintain incrementally; final state = batch sketch") {
    // hllRegisters is a commutative groupBy/max — legal as a streaming agg
    // in Update mode: the 100 TB "distinct users so far" dashboard pattern
    // with bounded state (m registers per group), no distinct-set blowup
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, lit, max}
    val input = MemoryStream[String]
    val q = graft.operators.Sketches
      .hllRegisters(input.toDS().toDF("v").withColumn("g", lit("all")),
        Seq("g"), "v")
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((0 until 500).map(i => s"u$i"): _*)
      q.processAllAvailable()
      input.addData((300 until 900).map(i => s"u$i"): _*) // 400 new, 200 repeat
      q.processAllAvailable()
      // latest state per bucket (Update mode re-emits changed buckets)
      val streamed = spark.table("hll_regs")
        .groupBy(col("bucket")).agg(max(col("rho")).as("rho"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val batch = graft.operators.Sketches
        .hllRegisters((0 until 900).map(i => s"u$i").toDF("v")
          .withColumn("g", lit("all")), Seq("g"), "v")
        .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("KMV sketch maintains incrementally over micro-batches (kmvMerge)") {
    // ingestion-time distinct/overlap monitoring: each micro-batch's
    // sketch folds into the running state via kmvMerge — KMV's closure
    // property makes the folded state EXACTLY the sketch of all data
    // seen, with no re-scan of prior batches. Final state must equal the
    // batch-built sketch over the full stream.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    val k = 32
    var state: org.apache.spark.sql.DataFrame = null
    val input = MemoryStream[(String, String)]
    val q = input.toDS().toDF("g", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        this.synchronized {
          val bs = Sketches.kmvSketch(batch, Seq("g"), "v", k)
          state = if (state == null) bs.cache()
            else Sketches.kmvMerge(state, bs, Seq("g"), k).cache()
          state.count() // materialize before the old plan is unreachable
        }
        (): Unit
      }.start()
    try {
      input.addData((0 until 200).map(i => ("a", s"x$i")): _*)
      q.processAllAvailable()
      input.addData((100 until 300).map(i => ("a", s"x$i")) ++
        (0 until 150).map(i => ("b", s"y$i")): _*)
      q.processAllAvailable()
      val streamed = state.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val all = ((0 until 300).map(i => ("a", s"x$i")) ++
        (0 until 150).map(i => ("b", s"y$i"))).toDF("g", "v")
      val batchBuilt = Sketches.kmvSketch(all, Seq("g"), "v", k).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(streamed == batchBuilt && streamed.nonEmpty)
    } finally q.stop()
  }

  test("BM25 serves streaming query batches from the PERSISTED index") {
    // the retrieval analog of the persisted-LSH serve test: the inverted
    // index is built and saved ONCE (the q114 artifact); each arriving
    // micro-batch of queries is scored against the LOADED postings with
    // no corpus re-tokenization — and the streamed ranking must equal
    // the batch path's on the same queries.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.operators.Retrieval
    val corpus = Seq(
      (0L, "spark shuffle join broadcast"),
      (1L, "spark scan filter pushdown"),
      (2L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
    val terms = corpus.select(col("doc_id"),
      explode(split(lower(col("text")), "\\s+")).as("term"))
    val path = tmpDir("bm25_stream_index")
    Retrieval.saveBm25Index(Retrieval.buildBm25Index(terms), path)
    val loaded = Retrieval.loadBm25Index(spark, path)
    def rank(qterms: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25Ranked(qterms, loaded, 1.2, 0.75, 1L << 20)
        .select("q_id", "rank", "doc_id", "score")
    val results = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("q_id", "qtext")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val qterms = batch.select(col("q_id"),
          explode(split(lower(col("qtext")), "\\s+")).as("term")).distinct()
        results.synchronized {
          results ++= rank(qterms).collect().map(_.toSeq)
        }
        (): Unit
      }.start()
    try {
      input.addData((100L, "spark join"), (101L, "filter pushdown"))
      q.processAllAvailable()
      val batchTerms = Seq((100L, "spark"), (100L, "join"),
        (101L, "filter"), (101L, "pushdown")).toDF("q_id", "term")
      val want = rank(batchTerms).collect().map(_.toSeq).toSet
      assert(results.toSet == want && want.nonEmpty)
      // ranking sanity: for "spark join", doc 0 (both terms) beats doc 1
      val r100 = results.filter(_.head == 100L)
        .map(r => r(2).asInstanceOf[Long] -> r(1).asInstanceOf[Long]).toMap
      assert(r100(0L) < r100(1L))
      assert(!r100.contains(2L))
    } finally q.stop()
  }
}
