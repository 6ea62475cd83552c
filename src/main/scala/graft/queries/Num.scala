package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric helpers for oracle-exact aggregation.
  *
  * Double sums are order-dependent in the last ULPs, and Spark's partial/final
  * aggregation order differs from DuckDB's. Summing through an exact decimal
  * and casting the final value back to double makes the result bit-identical
  * in both engines regardless of parallelism — which also means the result is
  * stable from local[32] up to a 1000-executor cluster.
  */
object Num {
  /** Exact sum of a money-ish double column: decimal-sum, surfaced as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  /** Order-independent average: exact decimal sum divided by count (both
    * deterministic), division done in double — identical in Spark and DuckDB. */
  def davg(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType) / count(lit(1))

  /** SQL fragment equivalents for the DuckDB oracle. */
  def sqlSum(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE)"
  def sqlAvg(expr: String, scale: Int = 6): String =
    s"CAST(sum(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE) / count(*)"
}
