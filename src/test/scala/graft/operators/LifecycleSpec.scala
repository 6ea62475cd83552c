package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.SparkSpec
import graft.kvstore.{InMemoryMapKeyValueStore, KeyValueStore}
import graft.operators.Lifecycle._

/** End-to-end lifecycle tests recreating the reference's canonical fixture:
  * two users with zip codes, gather (zip, user) pairs, distinct-count per
  * zip (TestGatherer.java:91-150 + TestGathererReducer.java:120-160). */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def users = Seq(
    ("Marsellus Wallace", "Marsellus", "Wallace", 94110),
    ("Vincent Vega", "Vincent", "Vega", 94110)
  ).toDF("entity_id", "first_name", "last_name", "zip_code")

  object ZipGatherer extends Gatherer[Int, String] {
    var setupCount = 0 // driver-side copy unchanged; per-task copies mutate
    override def counterNames: Seq[String] = Seq("rows")
    def gather(row: Row, emit: (Int, String) => Unit, ctx: OperatorContext): Unit = {
      ctx.incrementCounter("rows")
      emit(row.getAs[Int]("zip_code"), row.getAs[String]("first_name"))
    }
  }

  test("gatherer: canonical zip/user fixture emits both pairs") {
    val counters = Counters(spark, ZipGatherer.counterNames)
    val out = runGatherer(users, ZipGatherer, counters).collect().toSet
    assert(out == Set((94110, "Marsellus"), (94110, "Vincent")))
    assert(counters.value("rows") == 2)
  }

  test("gatherer + distinct-count reduce per zip (TestGathererReducer)") {
    val pairs = runGatherer(users, ZipGatherer, Counters(spark, Seq("rows")))
      .toDF("zip", "user")
    val counts = pairs.groupBy("zip").agg(
      org.apache.spark.sql.functions.countDistinct("user").as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(counts == Map(94110 -> 2L))
  }

  test("producer: derived column lands in outputColumn; None -> null") {
    object InitialsProducer extends Producer {
      def outputColumn = "initials"
      def outputType = StringType
      def produce(row: Row, ctx: OperatorContext): Option[Any] = {
        val f = row.getAs[String]("first_name")
        if (f == "Vincent") None
        else Some(s"${f.head}${row.getAs[String]("last_name").head}")
      }
    }
    val out = runProducer(users, InitialsProducer, Counters.empty)
      .select("entity_id", "initials")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("Marsellus Wallace") == "MW")
    assert(out("Vincent Vega") == null)
  }

  test("pivoter: re-keys cells onto a different entity (TestPivoter)") {
    object ZipPivoter extends Pivoter[Long, String] {
      def pivot(row: Row, emit: CellPut[Long, String] => Unit, ctx: OperatorContext): Unit =
        emit(CellPut(row.getAs[Int]("zip_code").toLong, "primitives", "string",
          1L, row.getAs[String]("entity_id")))
    }
    val cells = runPivoter(users, ZipPivoter, Counters.empty).collect()
    assert(cells.length == 2)
    assert(cells.forall(c => c.entity_id == 94110L && c.family == "primitives"))
    assert(cells.map(_.value).toSet == Set("Marsellus Wallace", "Vincent Vega"))
  }

  test("bulk importer: rowKey:value colon records (TestBulkImporter)") {
    object Importer extends BulkImporter[String, Long, String] {
      def importRecord(rec: String, emit: CellPut[Long, String] => Unit,
                       ctx: OperatorContext): Unit = {
        val i = rec.indexOf(':')
        if (i > 0) emit(CellPut(rec.take(i).toLong, "info", "name", 0L, rec.drop(i + 1)))
      }
    }
    val ds = spark.createDataset(Seq("1:Marsellus Wallace", "2:Vincent Vega", "garbage"))
    val cells = runBulkImporter(ds, Importer, Counters.empty).collect()
    assert(cells.map(c => c.entity_id -> c.value).toSet ==
      Set(1L -> "Marsellus Wallace", 2L -> "Vincent Vega"))
  }

  test("kv store binding: getStore().get() inside gather; unbound name fails") {
    final class LookupGatherer(s: KeyValueStore[String, String])
        extends Gatherer[String, String] {
      override def requiredStores = Map("states" -> s)
      def gather(row: Row, emit: (String, String) => Unit, ctx: OperatorContext): Unit =
        emit(row.getAs[String]("first_name"),
          ctx.getStore("states").get(row.getAs[Int]("zip_code").toString)
            .getOrElse("??"))
    }
    val store = InMemoryMapKeyValueStore(Map("94110" -> "CA"))
    val out = runGatherer(users, new LookupGatherer(store), Counters.empty)
      .collect().toSet
    assert(out == Set(("Marsellus", "CA"), ("Vincent", "CA")))
  }

  test("lifecycle order: setup before first row, cleanup after last") {
    val acc = spark.sparkContext.collectionAccumulator[String]("order")
    object TracingGatherer extends Gatherer[Int, Int] {
      override def setup(ctx: OperatorContext): Unit = acc.add("setup")
      def gather(row: Row, emit: (Int, Int) => Unit, ctx: OperatorContext): Unit =
        acc.add("row")
      override def cleanup(ctx: OperatorContext): Unit = acc.add("cleanup")
    }
    runGatherer(users.repartition(1), TracingGatherer, Counters.empty).collect()
    val events = acc.value.toArray.map(_.toString).toList
    assert(events == List("setup", "row", "row", "cleanup"))
  }
}
