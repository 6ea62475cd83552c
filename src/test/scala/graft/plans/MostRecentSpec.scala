package graft.plans

import graft.SparkSpec

/** The shared test session is built with GraftExtensions (extensions must
  * be present at builder time — a later getOrCreate can't add them). */
class MostRecentSpec extends SparkSpec {

  private def versionsDf = {
    import spark.implicits._
    Seq(
      (1L, Seq((10L, "old"), (30L, "new"), (20L, "mid"))),
      (2L, Seq((5L, "only"))),
      (3L, Seq.empty[(Long, String)])
    ).toDF("entity_id", "versions")
      .selectExpr("entity_id",
        "transform(versions, v -> struct(v._1 AS ts, v._2 AS value)) AS versions")
  }

  test("most_recent picks max-ts element; empty array -> null") {
    val out = versionsDf
      .selectExpr("entity_id", "most_recent(versions).value AS v")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "new", 2L -> "only", 3L -> null))
  }

  test("most_recent participates in whole-stage codegen") {
    // spark.range keeps a real physical stage (a local Seq collapses to
    // LocalTableScan with no codegen span), and the versions are built
    // with plain array/struct — a transform() lambda would itself be
    // codegen-fallback and evict the Project from the span.
    val df = spark.range(100)
      .selectExpr("array(struct(id AS ts, 1L AS v), struct(id + 5 AS ts, 2L AS v)) AS versions")
      .selectExpr("most_recent(versions).ts AS newest")
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators are star-marked: "*(1) Project [most_recent..."
    val projLine = plan.linesIterator.find(_.contains("most_recent")).get.trim
    assert(projLine.startsWith("*("), s"most_recent Project not codegen'd:\n$plan")
    assert(df.agg(org.apache.spark.sql.functions.max("newest")).head().getLong(0) == 104L)
  }

  test("most_recent matches the composable max(struct) plan on real data") {
    import spark.implicits._
    val cells = Seq(
      (1L, 10L, 1.5), (1L, 20L, 2.5), (2L, 7L, -1.0), (2L, 3L, 9.9)
    ).toDF("entity_id", "ts", "value")
    val viaExpr = cells.groupBy($"entity_id")
      .agg(org.apache.spark.sql.functions.collect_list(
        org.apache.spark.sql.functions.struct($"ts", $"value")).as("versions"))
      .selectExpr("entity_id", "most_recent(versions).value AS v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaExpr == Map(1L -> 2.5, 2L -> (-1.0)))
  }

  test("type errors are analysis-time") {
    intercept[org.apache.spark.sql.AnalysisException] {
      versionsDf.selectExpr("most_recent(entity_id)").collect()
    }
  }
}
