package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training / embedding pipelines: split each
  * document into fixed-size character windows with overlap.
  *
  * Pure column math (`sequence` + `explode` + `substring` — whole-stage
  * codegen, no UDF): each row fans out into its chunk starts, so the
  * transform is scan-shaped and embarrassingly parallel at 100 TB. Chunk
  * identity is `(doc id, chunk_start)`, deterministic by construction —
  * re-chunking a grown corpus never renumbers existing chunks (the
  * property that makes downstream embedding caches reusable).
  */
object Chunking {

  /** Explode `textCol` into overlapping character windows of `size`,
    * stepping by `size - overlap`. Chunks start at 0, step, 2*step, …
    * strictly below the text length; empty documents produce no chunks.
    * Output adds `chunk_start` (0-based) and `chunk` columns. */
  def chunkChars(df: DataFrame, textCol: String,
                 size: Int, overlap: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive: $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size): overlap=$overlap size=$size")
    Seq("chunk_start", "chunk").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column (the chunker's output column)")
    }
    val step = size - overlap
    val len = length(col(textCol))
    // sequence's upper bound must be >= start for a non-empty array; the
    // greatest(..., 0) keeps empty texts from a negative bound (their lone
    // start=0 candidate is then dropped by the < len filter).
    df.withColumn("chunk_start",
        explode(sequence(lit(0), greatest(len - 1, lit(0)), lit(step))))
      .filter(col("chunk_start") < len)
      .withColumn("chunk",
        substr(col(textCol), col("chunk_start") + lit(1), lit(size)))
  }
}
