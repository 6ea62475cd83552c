package graft.jobs

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.jobs.Jobs._
import graft.kvstore.{InMemoryMapKeyValueStore, KeyValueStore, UnconfiguredKeyValueStore}
import graft.operators.Lifecycle._

class JobsSpec extends SparkSpec {
  import spark.implicits._

  private def users = Seq(
    ("Marsellus Wallace", 94110), ("Vincent Vega", 94110)
  ).toDF("name", "zip")

  object CountingGatherer extends Gatherer[Int, String] {
    override def counterNames: Seq[String] = Seq("rows_processed")
    def gather(row: Row, emit: (Int, String) => Unit, ctx: OperatorContext): Unit = {
      ctx.incrementCounter("rows_processed")
      emit(row.getAs[Int]("zip"), row.getAs[String]("name"))
    }
  }

  test("gather job: runs, succeeds, counters populated") {
    val r = new GatherJobBuilder(CountingGatherer)
      .withInput(users).withName("zip-gather").run()
    assert(r.status == "SUCCEEDED")
    assert(r.counters("rows_processed") == 2L)
    assert(r.output.get.count() == 2)
  }

  test("missing input is a build/validation error, not a runtime surprise") {
    intercept[IllegalStateException] {
      new GatherJobBuilder(CountingGatherer).run()
    }
  }

  test("unbound UnconfiguredKeyValueStore fails validation; binding fixes it") {
    object NeedsStore extends Gatherer[Int, String] {
      override def requiredStores: Map[String, KeyValueStore[String, String]] =
        Map("lookup" -> UnconfiguredKeyValueStore[String, String]())
      def gather(row: Row, emit: (Int, String) => Unit, ctx: OperatorContext): Unit =
        emit(row.getAs[Int]("zip"),
          ctx.getStore("lookup").get(row.getAs[Int]("zip").toString).getOrElse("?"))
    }
    intercept[IllegalStateException] {
      new GatherJobBuilder(NeedsStore).withInput(users).run()
    }
    val r = new GatherJobBuilder(NeedsStore).withInput(users)
      .withStore("lookup", InMemoryMapKeyValueStore(Map("94110" -> "CA")))
      .run()
    assert(r.status == "SUCCEEDED")
    assert(r.output.get.as[(Int, String)].collect().forall(_._2 == "CA"))
  }

  test("facade executes the plan exactly once (write is the only action)") {
    val out = tmpDir("once") + "/out"
    val r = new GatherJobBuilder(CountingGatherer)
      .withInput(users).withName("once-job")
      .run(df => df.write.mode("overwrite").parquet(out))
    // rows_processed doubles if the facade forces the plan a second time
    assert(r.counters("rows_processed") == 2L)
    assert(spark.read.parquet(out).count() == 2)
  }

  test("table KV store: lazy guarded broadcast serves executor-side point gets") {
    val customers = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq((1L, 10.0), (1L, 5.0), (2L, 7.0), (99L, 1.0))
      .toDF("o_custkey", "o_totalprice")
    val store = new graft.kvstore.TableKeyValueStore(
      customers, "c_custkey", "c_mktsegment")
    val g = new graft.queries.LifecycleQueries.SegmentGatherer(store)
    val rows = graft.operators.Lifecycle
      .runGatherer(orders, g, Counters(spark, g.counterNames)).collect()
    assert(rows.toSet ==
      Set(("BUILDING", 10.0), ("BUILDING", 5.0), ("MACHINERY", 7.0)))
  }

  test("job history: run row with full conf map + per-counter queryable rows") {
    val histPath = tmpDir("hist") + "/job_history"
    val hist = new JobHistory(spark, histPath)
    new GatherJobBuilder(CountingGatherer)
      .withInput(users).withName("hist-job").withHistory(hist).run()
    val rows = hist.table.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("job_name") == "hist-job")
    assert(r.getAs[String]("job_end_status") == "SUCCEEDED")
    assert(r.getAs[Long]("job_end_time") >= r.getAs[Long]("job_start_time"))
    // full job configuration recorded as a queryable map
    val conf = r.getAs[Map[String, String]]("job_configuration")
    assert(conf.get("spark.sql.shuffle.partitions").contains("4"))
    // one row per counter, joined to the run by job_id
    val jobId = r.getAs[String]("job_id")
    val counters = hist.counters.collect()
      .map(c => (c.getAs[String]("job_id"), c.getAs[String]("counter_name"),
        c.getAs[Long]("counter_value")))
    assert(counters.toSeq == Seq((jobId, "rows_processed", 2L)))
  }

  test("xml store bindings: parse, bind, builder override wins") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val kvFile = Paths.get(tmpDir("xmlkv"), "states.tsv")
    Files.write(kvFile, "94110\tCA\n".getBytes(StandardCharsets.UTF_8))
    val xml =
      s"""<stores>
         |  <store name="states" class="text">
         |    <configuration>
         |      <property><name>path</name><value>$kvFile</value></property>
         |    </configuration>
         |  </store>
         |  <store name="extra" class="empty"/>
         |</stores>""".stripMargin
    val bindings = graft.kvstore.XmlStoreBindings.parse(xml)
    assert(bindings("states").reader().get("94110").contains("CA"))
    assert(bindings("extra").reader().get("anything").isEmpty)
    // builder override beats XML binding
    object G extends Gatherer[Int, String] {
      override def requiredStores: Map[String, KeyValueStore[String, String]] =
        Map("states" -> UnconfiguredKeyValueStore[String, String]())
      def gather(row: Row, emit: (Int, String) => Unit, ctx: OperatorContext): Unit =
        emit(row.getAs[Int]("zip"),
          ctx.getStore("states").get(row.getAs[Int]("zip").toString).getOrElse("?"))
    }
    val r = new GatherJobBuilder(G).withInput(users)
      .withStoreBindingsXml(xml)
      .withStore("states", InMemoryMapKeyValueStore(Map("94110" -> "OVERRIDE")))
      .run()
    assert(r.output.get.as[(Int, String)].collect().forall(_._2 == "OVERRIDE"))
  }

  test("submit(): async handle resolves to the same result") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    val f = new GatherJobBuilder(CountingGatherer)
      .withInput(users).withName("async-job").submit()
    val r = Await.result(f, 120.seconds)
    assert(r.status == "SUCCEEDED" && r.counters("rows_processed") == 2L)
  }

  test("produce job: derived column through the facade") {
    object Upper extends Producer {
      def outputColumn = "upper_name"
      def outputType = org.apache.spark.sql.types.StringType
      def produce(row: Row, ctx: OperatorContext): Option[Any] =
        Some(row.getAs[String]("name").toUpperCase)
    }
    val r = new ProduceJobBuilder(Upper).withInput(users).run()
    assert(r.output.get.select("upper_name").as[String].collect().toSet ==
      Set("MARSELLUS WALLACE", "VINCENT VEGA"))
  }

  test("pivot job: cells for re-keyed entities through the facade") {
    object P extends Pivoter[Long, String] {
      def pivot(row: Row, emit: CellPut[Long, String] => Unit, ctx: OperatorContext): Unit =
        emit(CellPut(row.getAs[Int]("zip").toLong, "info", "resident", 1L,
          row.getAs[String]("name")))
    }
    val r = new PivotJobBuilder(P).withInput(users).run()
    val cells = r.output.get.collect()
    assert(cells.length == 2 && cells.forall(_.getAs[Long]("entity_id") == 94110L))
  }

  test("bulk-import job: text records to cells through the facade") {
    object I extends BulkImporter[String, Long, String] {
      def importRecord(rec: String, emit: CellPut[Long, String] => Unit,
                       ctx: OperatorContext): Unit = {
        val i = rec.indexOf(':')
        if (i > 0) emit(CellPut(rec.take(i).toLong, "info", "name", 0L, rec.drop(i + 1)))
      }
    }
    val lines = Seq("7:Jules", "8:Mia").toDF("value")
    val r = new BulkImportJobBuilder(I).withInput(lines).run()
    assert(r.output.get.collect().map(c =>
      c.getAs[Long]("entity_id") -> c.getAs[String]("value")).toSet ==
      Set(7L -> "Jules", 8L -> "Mia"))
  }
}
