package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutJsonSpec extends SparkSpec {
  import spark.implicits._

  /** Same dialect and fields as the reference's layout test.json: block
    * comment header, unquoted field names, single-quoted schema strings,
    * HASH_PREFIX keys, locality-group retention knobs. */
  private val layoutJson =
    """/**
      | * Table used for testing purposes.
      | */
      |{
      |  name: "test",
      |  description: "Table used for testing purposes.",
      |  keys_format: {encoding: "HASH_PREFIX", hash_type: "MD5", hash_size: 2},
      |  locality_groups: [ {
      |    name: "default",
      |    in_memory: false,
      |    max_versions: 3,
      |    ttl_seconds: 2147483647,
      |    compression_type: "NONE",
      |    families: [ {
      |      name: "info",
      |      columns: [ {
      |        name: "first_name",
      |        column_schema: {type: "INLINE", value: '"string"'}
      |      } ]
      |    }, {
      |      name: "primitives",
      |      columns: [ {
      |        name: "int",
      |        column_schema: {type: "INLINE", value: '"int"'}
      |      } ]
      |    }, {
      |      name: "map_family",
      |      map_schema: {type: "INLINE", value: '"string"'}
      |    } ]
      |  }, {
      |    name: "memory",
      |    in_memory: true,
      |    max_versions: 1,
      |    ttl_seconds: 86400,
      |    compression_type: "GZ",
      |    families: [ { name: "hot" } ]
      |  } ],
      |  version: "kiji-1.0"
      |}""".stripMargin

  test("layout JSON: reference-shaped declaration parses into TableLayout") {
    val layout = LayoutJson.parse(layoutJson)
    assert(layout.name == "test")
    // hash_size is MD5 BYTES: 2 bytes -> 4 hex chars of salt
    assert(layout.keyEncoding == EntityId.HashPrefix(4))
    assert(layout.families.map(_.name) ==
      Seq("info", "primitives", "map_family", "hot"))
    val info = layout.family("info")
    assert(info.maxVersions == 3)
    assert(info.ttlSeconds.isEmpty) // Int.MaxValue seconds = forever
    assert(info.localityGroup == "default" && !info.inMemory)
    assert(info.compression == "none")
    val hot = layout.family("hot")
    assert(hot.maxVersions == 1 && hot.ttlSeconds.contains(86400L))
    assert(hot.localityGroup == "memory" && hot.inMemory)
    assert(hot.compression == "gzip")
    assert(layout.localityGroups.keySet == Set("default", "memory"))
    // group-type families carry their closed qualifier set; map-schema and
    // column-less families stay open
    assert(info.columns.contains(Seq("first_name")))
    assert(layout.family("map_family").columns.isEmpty)
    assert(hot.columns.isEmpty)
  }

  test("layout JSON: parsed layout drives a working EntityTable") {
    val layout = LayoutJson.parse(layoutJson)
    val path = tmpDir("layouttbl") + "/t"
    val table = new EntityTable(spark, path, layout)
    val key = EntityId.encodeValue(layout.keyEncoding, Seq(42L))
    val cells = Seq(
      (key, "info", "first_name", 1L, 1.0),
      (key, "info", "first_name", 2L, 2.0),
      (key, "info", "first_name", 3L, 3.0),
      (key, "info", "first_name", 4L, 4.0),
      (key, "hot", "h", 1L, 7.0),
    ).toDF("entity_id", "family", "qualifier", "ts", "value")
    table.bulkLoad(cells, numPartitions = 2)
    // per-locality-group file sets on disk
    val sub = new java.io.File(live(path)).listFiles().map(_.getName).toSet
    assert(sub.contains("lg=default") && sub.contains("lg=memory"))
    // group-pruned read sees only its own families...
    assert(table.localityGroupCells("memory")
      .select("family").as[String].collect().toSet == Set("hot"))
    // ...and the filter lands as a PARTITION filter (file-set pruning),
    // not a post-scan row filter
    val plan = table.localityGroupCells("memory")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("(lg"))
    // max_versions=3 from the layout trims the 4 versions on read
    val versions = table.read(DataRequest(maxVersions = 10))
      .filter(col("family") === "info")
      .select(size(col("versions"))).as[Int].collect()
    assert(versions.toList == List(3))
    // in_memory groups (and only those) get cached on request
    val cached = table.cacheInMemoryGroups()
    try {
      assert(cached.keySet == Set("memory"))
      assert(cached("memory").storageLevel.useMemory)
    } finally cached.values.foreach(_.unpersist())
  }
}
