package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.SparkSpec

/** Regression for the round-16 concurrent plan-sharing corruption: two
  * frames derived from ONE higher-order-function-bearing plan share the
  * same `NamedLambdaVariable` instances, whose per-evaluation mutable
  * slot cross-wires rows when the plans evaluate concurrently (observed
  * as swapped (n_id, c_id) pairs). `Clustering.concurrentFrames` must
  * remove the hazard structurally — isolation before concurrency — not
  * by call-site convention. */
class ConcurrencyGuardSpec extends SparkSpec {

  import graft.functions.VectorFunctions.scaled

  /** A plan whose projection carries higher-order functions (sequence →
    * transform → scaled's transform) — the `scaled`-bearing shape that
    * cross-wired in round 16. */
  private def hofBase = {
    spark.range(0, 400).toDF("id")
      .withColumn("v", transform(sequence(lit(1), lit(8)),
        x => (x * (col("id") + 1)).cast("double")))
      .withColumn("sv", scaled(col("v")))
  }

  test("frames derived from one HOF-bearing plan share lambda-variable " +
      "instances; isolateLambdas removes the sharing without changing " +
      "results") {
    val base = hofBase
    val a = base.filter(col("id") % 2 === 0)
      .select(col("id"), element_at(col("sv"), 8).as("x"))
    val b = base.filter(col("id") % 2 === 1)
      .select(col("id"), element_at(col("sv"), 8).as("x"))
    // the hazard is real: both plans hold the SAME variable instances
    assert(PlanBridge.lambdaVarsOf(a).nonEmpty, "test plan must carry HOFs")
    assert(PlanBridge.sharedLambdaVars(Seq(a, b)).nonEmpty,
      "two frames off one plan must share lambda variables (the hazard)")
    val isoA = PlanBridge.isolateLambdas(a)
    val isoB = PlanBridge.isolateLambdas(b)
    assert(PlanBridge.sharedLambdaVars(Seq(isoA, isoB)).isEmpty)
    assert(PlanBridge.sharedLambdaVars(Seq(a, isoA)).isEmpty,
      "an isolated copy must not share state with its source either")
    // same results, exact
    assert(isoA.collect().map(_.toSeq).toSet ==
      a.collect().map(_.toSeq).toSet)
    assert(isoB.collect().map(_.toSeq).toSet ==
      b.collect().map(_.toSeq).toSet)
  }

  test("concurrentFrames evaluates shared-plan HOF frames concurrently " +
      "without cross-wiring (round-16 regression)") {
    val base = hofBase
    val a = base.filter(col("id") % 2 === 0)
      .select(col("id"), element_at(col("sv"), 8).as("x"))
    val b = base.filter(col("id") % 2 === 1)
      .select(col("id"), element_at(col("sv"), 8).as("x"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectA = rows(a)
    val expectB = rows(b)
    assert(expectA.nonEmpty && expectB.nonEmpty &&
      expectA.map(_._1).intersect(expectB.map(_._1)).isEmpty)
    (1 to 8).foreach { round =>
      val res = Clustering.concurrentFrames(Seq(a, b))((_, df) => rows(df))
      assert(res(0) == expectA, s"frame A cross-wired on round $round")
      assert(res(1) == expectB, s"frame B cross-wired on round $round")
    }
  }

  test("isolateLambdas preserves cache substitution (exprIds unchanged)") {
    val base = hofBase.select(col("id"), element_at(col("sv"), 3).as("x"))
      .persist()
    try {
      base.count() // materialize
      val iso = PlanBridge.isolateLambdas(base)
      val cached = iso.queryExecution.withCachedData
      assert(cached.toString.contains("InMemoryRelation"),
        s"isolated copy must still substitute the cache:\n$cached")
      assert(iso.collect().map(_.toSeq).toSet ==
        base.collect().map(_.toSeq).toSet)
    } finally { base.unpersist(); () }
  }
}
