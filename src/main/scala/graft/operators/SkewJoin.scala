package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer; at
  * 100 TB a single key holding 1% of the corpus turns into a straggler
  * task with 1 TB of input. Salting splits each key's left rows across
  * `salt` sub-keys (deterministic per-row hash, so reruns shuffle
  * identically) and replicates the right side's rows to all `salt`
  * sub-keys — right-side replication costs salt× the SMALL side, left
  * skew divides by salt.
  *
  * The result is row-for-row identical to the unsalted inner join (each
  * left row meets each matching right row in exactly one sub-key), which
  * is what makes the operator oracle-checkable and drop-in.
  *
  * This is the manual, always-on form of what AQE's skew-join splitting
  * does adaptively; use it when the skew is known ahead of time (word
  * frequencies, null-ish sentinel keys, celebrity entities) or when the
  * join sits under further operators AQE cannot re-plan.
  */
object SkewJoin {

  /** Inner equi-join on `key`, left salted by a hash of `leftSaltSrc`
    * (any left column; value distribution does not matter for
    * correctness, only for balance — pick a high-cardinality one). */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
                  salt: Int, leftSaltSrc: String): DataFrame = {
    require(salt > 0, s"salt factor must be positive: $salt")
    Seq(left, right).foreach { df =>
      require(!df.columns.contains("__salt"),
        "input already has a __salt column (reserved for the salted join)")
    }
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(leftSaltSrc)), lit(salt.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
