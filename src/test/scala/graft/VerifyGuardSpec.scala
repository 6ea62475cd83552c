package graft

/** The driver's correctness checker compares results through pandas, which
  * cannot hash ARRAY/MAP/STRUCT cells — a complex-typed output column
  * silently voids a query's external verification. `Verify` guards this at
  * dump time; this spec proves the guard bites AND that every declared
  * query honors the contract. */
class VerifyGuardSpec extends SparkSpec {
  import spark.implicits._

  test("requireScalarSchema rejects array/map/struct output columns") {
    val bad = Seq((1L, Seq(1.0))).toDF("id", "centroid")
    val e = intercept[IllegalArgumentException](
      Verify.requireScalarSchema("qX", bad.schema))
    assert(e.getMessage.contains("non-scalar") &&
      e.getMessage.contains("centroid"))
    val m = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    intercept[IllegalArgumentException](
      Verify.requireScalarSchema("qM", m.schema))
    val st = spark.sql("SELECT 1 AS id, struct(1 AS a) AS s")
    intercept[IllegalArgumentException](
      Verify.requireScalarSchema("qS", st.schema))
    // scalars (incl. timestamp, decimal, binary) pass
    Verify.requireScalarSchema("ok", spark.sql(
      "SELECT 1L AS id, 'x' AS s, 1.5 AS d, current_timestamp() AS ts, " +
        "CAST('b' AS BINARY) AS b").schema)
  }

  test("every declared query emits scalar columns only (driver contract)") {
    val sf = "/root/testdata/sf0.001"
    // the sweep needs the generated fixtures; on a machine without them,
    // skip (cancel) instead of failing with an opaque missing-path error
    assume(new java.io.File(sf).isDirectory, s"fixture dir $sf not present")
    val bad = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        Verify.requireScalarSchema(name, fn(spark, sf).schema)
        graft.operators.OperatorCaches.releaseAll()
        None
      } catch {
        case e: IllegalArgumentException if e.getMessage.contains("non-scalar") =>
          Some(s"$name: ${e.getMessage}")
      }
    }
    assert(bad.isEmpty, s"complex-typed query outputs:\n${bad.mkString("\n")}")
  }
}
