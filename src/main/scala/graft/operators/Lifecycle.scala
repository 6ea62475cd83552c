package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.util.LongAccumulator

import graft.kvstore.{KeyValueStore, KeyValueStoreReader}

/** The reference's operator programming model, re-expressed on Dataset.
  *
  * All four user-operator types (Gatherer / Producer / Pivoter /
  * BulkImporter, `KM/gather/KijiGatherer.java:44-71` and siblings) share the
  * lifecycle `setup → N×process → cleanup`, with access to bound
  * KeyValueStores and counters. Spark mapping: closure construction on the
  * driver, `mapPartitions` with a prologue (setup: open store readers) and
  * epilogue (cleanup) per partition, counters as `LongAccumulator`s captured
  * in the closure.
  *
  * These runners are the *extensibility* path — arbitrary per-row imperative
  * logic. The relational fast path (plain DataFrame expressions) remains
  * preferred whenever the logic is expressible as columns, because it keeps
  * whole-stage codegen; the runners exist for the cases it is not.
  */
object Lifecycle {

  /** Numeric-tolerant row accessor: parquet int columns surface as
    * java.lang.Integer, which a bare getAs[Long] class-casts on. */
  def longAt(row: Row, name: String): Long =
    row.get(row.fieldIndex(name)).asInstanceOf[Number].longValue()

  /** Counter registry — analog of `KijiContext.incrementCounter`
    * (`KM/KijiContext.java:56-69`) backed by named LongAccumulators.
    * Accumulators must be created on the driver; operators declare their
    * counter names up front (like the reference's enum counters). */
  final class Counters private (val accs: Map[String, LongAccumulator])
      extends Serializable {
    def apply(name: String): LongAccumulator = accs(name)
    def value(name: String): Long = accs(name).value
  }
  object Counters {
    def apply(spark: SparkSession, names: Seq[String]): Counters =
      new Counters(names.map { n =>
        n -> spark.sparkContext.longAccumulator(s"graft.$n")
      }.toMap)
    val empty: Counters = new Counters(Map.empty)
  }

  /** Per-task operator context: bound stores + counters — the parts of
    * `KijiContext` that survive the move to Spark (progress/status are
    * handled by the Spark UI). */
  final class OperatorContext(stores: Map[String, KeyValueStore[String, String]],
                              counters: Counters) extends Serializable {
    @transient private lazy val readers =
      scala.collection.mutable.Map.empty[String, KeyValueStoreReader[String, String]]
    def getStore(name: String): KeyValueStoreReader[String, String] =
      readers.getOrElseUpdate(name,
        stores.getOrElse(name, throw new IllegalArgumentException(
          s"no store bound under '$name'")).reader())
    def incrementCounter(name: String, by: Long = 1L): Unit =
      counters(name).add(by)
  }

  /** Gatherer: scan rows, emit K/V pairs (`KijiGatherer.gather`,
    * `KM/gather/KijiGatherer.java:158`; context.write
    * `KM/gather/GathererContext.java:46`). */
  trait Gatherer[K, V] extends Serializable {
    def setup(ctx: OperatorContext): Unit = {}
    def gather(row: Row, emit: (K, V) => Unit, ctx: OperatorContext): Unit
    def cleanup(ctx: OperatorContext): Unit = {}
    def requiredStores: Map[String, KeyValueStore[String, String]] = Map.empty
    def counterNames: Seq[String] = Seq.empty
  }

  /** Producer: derive one value per row, written back as a new column —
    * (`KijiProducer.produce` `KM/produce/KijiProducer.java:183`;
    * `getOutputColumn` `:161`). The produced value lands in
    * `outputColumn`; `None` leaves a null (reference: no put). */
  trait Producer extends Serializable {
    def outputColumn: String
    def outputType: DataType
    def setup(ctx: OperatorContext): Unit = {}
    def produce(row: Row, ctx: OperatorContext): Option[Any]
    def cleanup(ctx: OperatorContext): Unit = {}
    def requiredStores: Map[String, KeyValueStore[String, String]] = Map.empty
    def counterNames: Seq[String] = Seq.empty
  }

  /** A timestamped cell write — the unit of Pivoter/BulkImporter output and
    * of the DML change feed (`KM/framework/HFileKeyValue.java` Put cells).
    * `K` is the entity-id type: Long for simple keys, String for composite
    * encoded keys (see `graft.table.EntityId.encodeValue` for building
    * multi-component keys inside an operator, the analog of
    * `KijiTableContext.getEntityId(components)` `KM/KijiTableContext.java:44`). */
  final case class CellPut[K, V](entity_id: K, family: String,
                                 qualifier: String, ts: Long, value: V)

  /** Pivoter: scan table A, emit cells keyed by any entity of table B
    * (`KijiPivoter.produce` `KM/pivot/KijiPivoter.java:168`). */
  trait Pivoter[K, V] extends Serializable {
    def setup(ctx: OperatorContext): Unit = {}
    def pivot(row: Row, emit: CellPut[K, V] => Unit, ctx: OperatorContext): Unit
    def cleanup(ctx: OperatorContext): Unit = {}
    def requiredStores: Map[String, KeyValueStore[String, String]] = Map.empty
    def counterNames: Seq[String] = Seq.empty
  }

  /** Bulk importer: parse one input record into cell puts
    * (`KijiBulkImporter.produce` `KM/bulkimport/KijiBulkImporter.java:163`). */
  trait BulkImporter[R, K, V] extends Serializable {
    def setup(ctx: OperatorContext): Unit = {}
    def importRecord(rec: R, emit: CellPut[K, V] => Unit, ctx: OperatorContext): Unit
    def cleanup(ctx: OperatorContext): Unit = {}
    def requiredStores: Map[String, KeyValueStore[String, String]] = Map.empty
    def counterNames: Seq[String] = Seq.empty
  }

  /** Wrap an iterator so the operator lifecycle brackets the partition:
    * setup before the first row, cleanup after the last. Cleanup is ALSO
    * registered as a task-completion listener, because a downstream `limit`
    * can abandon the iterator without ever driving `hasNext` to false — the
    * listener fires on task end (success, failure, or early stop) and the
    * `closed` flag keeps the two paths idempotent. */
  private def bracket[A](setup: () => Unit, it: Iterator[A],
                         cleanup: () => Unit): Iterator[A] = {
    setup()
    var closed = false
    def close(): Unit = if (!closed) { closed = true; cleanup() }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => close()))
    new Iterator[A] {
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) close()
        h
      }
      def next(): A = it.next()
    }
  }

  def runGatherer[K, V](df: DataFrame, g: Gatherer[K, V], counters: Counters)(
      implicit enc: Encoder[(K, V)]): Dataset[(K, V)] = {
    val stores = g.requiredStores
    df.mapPartitions { rows =>
      val ctx = new OperatorContext(stores, counters)
      val buf = new ArrayBuffer[(K, V)]()
      val emit = (k: K, v: V) => { buf += ((k, v)); () }
      bracket(() => g.setup(ctx),
        rows.flatMap { r => buf.clear(); g.gather(r, emit, ctx); buf.toList },
        () => g.cleanup(ctx))
    }
  }

  def runProducer(df: DataFrame, p: Producer, counters: Counters): DataFrame = {
    val stores = p.requiredStores
    val outSchema = StructType(df.schema.fields :+
      StructField(p.outputColumn, p.outputType, nullable = true))
    val enc = Encoders.row(outSchema)
    df.mapPartitions({ rows =>
      val ctx = new OperatorContext(stores, counters)
      bracket(() => p.setup(ctx),
        rows.map { r =>
          Row.fromSeq(r.toSeq :+ p.produce(r, ctx).orNull)
        },
        () => p.cleanup(ctx))
    })(enc)
  }

  def runPivoter[K, V](df: DataFrame, p: Pivoter[K, V], counters: Counters)(
      implicit enc: Encoder[CellPut[K, V]]): Dataset[CellPut[K, V]] = {
    val stores = p.requiredStores
    df.mapPartitions { rows =>
      val ctx = new OperatorContext(stores, counters)
      val buf = new ArrayBuffer[CellPut[K, V]]()
      val emit = (c: CellPut[K, V]) => { buf += c; () }
      bracket(() => p.setup(ctx),
        rows.flatMap { r => buf.clear(); p.pivot(r, emit, ctx); buf.toList },
        () => p.cleanup(ctx))
    }
  }

  def runBulkImporter[R, K, V](ds: Dataset[R], imp: BulkImporter[R, K, V],
                               counters: Counters)(
      implicit enc: Encoder[CellPut[K, V]]): Dataset[CellPut[K, V]] = {
    val stores = imp.requiredStores
    ds.mapPartitions { recs =>
      val ctx = new OperatorContext(stores, counters)
      val buf = new ArrayBuffer[CellPut[K, V]]()
      val emit = (c: CellPut[K, V]) => { buf += c; () }
      bracket(() => imp.setup(ctx),
        recs.flatMap { r => buf.clear(); imp.importRecord(r, emit, ctx); buf.toList },
        () => imp.cleanup(ctx))
    }
  }
}
