package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan pruning.
  *
  * A table range-partitioned on ONE key prunes scans on that key only; a
  * 100 TB events table laid out by user_id reads every file for a
  * time-range query. Interleaving the bits of two quantized dimensions
  * into one sort key clusters rows so every file covers a small RECTANGLE
  * of (dim1, dim2) space — parquet min/max footer stats then skip files
  * for predicates on EITHER dimension (Catalyst's stats-based file and
  * row-group skipping does the rest; no reader-side change needed).
  *
  * The reference has no physical-layout story beyond row-key order
  * (kiji-mapreduce delegates to HBase's single-dimension key sort); this
  * is the Spark-native generalization.
  */
object ZOrder {

  /** Morton-interleave two quantized non-negative columns (`bits` bits
    * each) into one long sort key: bit i of `a` lands at position 2i, bit
    * i of `b` at 2i+1. Pure bitwise column algebra — codegen'd, no UDF. */
  def mortonKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31: $bits")
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i) % 2, 2 * i) +
        shiftleft(shiftright(b, i) % 2, 2 * i + 1)).cast("long")
    }.reduce(_ + _)
  }

  /** Quantize a numeric column to [0, 2^bits) by min/max scaling. The
    * scale runs in double (integer (v-min)·(2^bits−1) overflows int64 on
    * microsecond-timestamp spans); the key is physical layout only — it
    * never reaches query results — so IEEE rounding is harmless.
    * Constant columns map to 0. */
  def quantize(v: Column, vMin: Column, vMax: Column, bits: Int): Column = {
    val span = vMax.cast("double") - vMin.cast("double")
    when(span === 0.0, 0L).otherwise(
      ((v.cast("double") - vMin.cast("double")) * ((1L << bits) - 1) / span)
        .cast("long"))
  }

  /** Write `df` z-ordered on two numeric columns: quantize both against
    * their global min/max (one tiny agg pass), range-partition + sort by
    * the Morton key, write parquet. Every output file covers a compact
    * rectangle of (c1, c2) space, so min/max footer stats prune scans
    * filtered on either column. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    bits: Int = 16, numFiles: Int = 0): Unit = {
    Seq("__zkey", "__zmin1", "__zmax1", "__zmin2", "__zmax2").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column (reserved for the z-order writer)")
    }
    val mm = df.agg(min(col(c1)).as("__zmin1"), max(col(c1)).as("__zmax1"),
      min(col(c2)).as("__zmin2"), max(col(c2)).as("__zmax2"))
    val keyed = df.crossJoin(broadcast(mm))
      .withColumn("__zkey", mortonKey(
        quantize(col(c1), col("__zmin1"), col("__zmax1"), bits),
        quantize(col(c2), col("__zmin2"), col("__zmax2"), bits), bits))
      .drop("__zmin1", "__zmax1", "__zmin2", "__zmax2")
    val parts = if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__zkey"))
                else keyed.repartitionByRange(col("__zkey"))
    parts.sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
