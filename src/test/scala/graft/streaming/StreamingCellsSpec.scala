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
}
