package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class EntityIdSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq((7L, 1, "us"), (42L, 3, "jp"), (123456789L, 2, "de"))
  private def df = rows.toDF("order_id", "line", "cc")
  private val comps = Seq(
    EntityId.intComp(col("order_id")), EntityId.intComp(col("line")),
    EntityId.strComp(col("cc")))

  test("column encode matches scalar encodeValue for every encoding") {
    for (enc <- Seq(EntityId.Formatted, EntityId.Hashed, EntityId.HashPrefix(4))) {
      val viaColumn = df.select(EntityId.encode(enc, comps).as("k"))
        .as[String].collect().toSeq
      val viaScalar = rows.map { case (o, l, c) =>
        EntityId.encodeValue(enc, Seq(o, l, c)) }
      assert(viaColumn == viaScalar, s"mismatch for $enc")
    }
  }

  test("negative integral components are rejected by BOTH encode paths") {
    // scalar path
    intercept[IllegalArgumentException] {
      EntityId.encodeValue(EntityId.Formatted, Seq(-5L, "us"))
    }
    // column path (raise_error surfaces at execution)
    val thrown = intercept[Exception] {
      Seq((-5L, "us")).toDF("id", "cc")
        .select(EntityId.encode(EntityId.Formatted,
          Seq(EntityId.intComp(col("id")), EntityId.strComp(col("cc")))))
        .collect()
    }
    assert(thrown.getMessage.contains("non-negative") ||
      Option(thrown.getCause).exists(_.getMessage.contains("non-negative")))
  }

  test("components decode back out of FORMATTED and HASH_PREFIX keys") {
    for (enc <- Seq(EntityId.Formatted, EntityId.HashPrefix(6))) {
      val back = df.select(EntityId.encode(enc, comps).as("k"))
        .select(
          EntityId.longComponent(enc, col("k"), 0).as("o"),
          EntityId.longComponent(enc, col("k"), 1).as("l"),
          EntityId.component(enc, col("k"), 2).as("c"))
        .as[(Long, Long, String)].collect().toSet
      assert(back == rows.map { case (o, l, c) => (o, l.toLong, c) }.toSet)
    }
  }

  test("FORMATTED key order equals numeric component order (zero-pad)") {
    val keys = Seq(9L, 10L, 99L, 100L, 123456789L)
      .map(v => EntityId.encodeValue(EntityId.Formatted, Seq(v)))
    assert(keys == keys.sorted)
  }

  test("RAW passes through; HASH is one-way; hash prefix spreads") {
    assert(EntityId.encodeValue(EntityId.Raw, Seq("abc")) == "abc")
    intercept[IllegalArgumentException](
      EntityId.component(EntityId.Hashed, col("x"), 0))
    // sequential keys land in many distinct 2-hex-char salt buckets
    val salts = (1L to 200L)
      .map(v => EntityId.encodeValue(EntityId.HashPrefix(2), Seq(v)).take(2))
      .distinct
    assert(salts.size > 100)
  }

  test("formattedRange selects exactly the leading-component slice") {
    val n = spark.range(1, 1000).select(
      EntityId.encode(EntityId.Formatted,
        Seq(EntityId.intComp(col("id")), EntityId.intComp(lit(1)))).as("k"))
      .filter(EntityId.formattedRange(col("k"), 100L, 250L))
      .count()
    assert(n == 150)
  }
}
