package graft.operators

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkChars: windows tile the document with the declared overlap") {
    val text = "abcdefghijklmnopqrstuvwxyz" // 26 chars
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.chunkChars(df, "text", size = 10, overlap = 4)
      .select("chunk_start", "chunk").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    // starts step by size-overlap=6, strictly below len=26
    assert(chunks.map(_._1).toSeq == Seq(0, 6, 12, 18, 24))
    assert(chunks.head._2 == "abcdefghij")
    assert(chunks(1)._2 == "ghijklmnop")        // overlaps previous by 4
    assert(chunks.last._2 == "yz")              // tail chunk is short
    // every character of the original appears at its position in a chunk
    chunks.foreach { case (start, c) =>
      assert(c == text.slice(start, start + 10))
    }
    // zero-overlap chunks concatenate back to the document exactly
    val exact = Chunking.chunkChars(df, "text", size = 7, overlap = 0)
      .select("chunk_start", "chunk").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(exact.map(_._2).mkString == text)
  }

  test("chunkChars: empty and sub-chunk documents") {
    val df = Seq((1L, ""), (2L, "hi")).toDF("doc_id", "text")
    val out = Chunking.chunkChars(df, "text", size = 100, overlap = 10)
      .select("doc_id", "chunk").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // empty text yields no chunks; short text yields itself, once
    assert(out.toSeq == Seq((2L, "hi")))
  }

  test("chunkChars: parameter validation") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Chunking.chunkChars(df, "text", 0, 0) }
    intercept[IllegalArgumentException] { Chunking.chunkChars(df, "text", 10, 10) }
    intercept[IllegalArgumentException] { Chunking.chunkChars(df, "text", 10, -1) }
  }
}
