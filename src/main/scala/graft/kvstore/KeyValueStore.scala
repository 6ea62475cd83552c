package graft.kvstore

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{SequenceFile, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Map-side lookup stores — the reference's only join facility.
  *
  * Re-expression of `kiji-mapreduce/src/main/java/org/kiji/mapreduce/kvstore/`
  * (`KeyValueStore.java`, `KeyValueStoreReader.java:67-77` get/containsKey):
  * a named side input, loaded whole into memory and shipped to every task —
  * the reference does this via DistributedCache, Spark via closure/broadcast
  * capture of the loaded map.
  *
  * Two consumption paths, matching how the store is used:
  *  - `reader().get(k)` — point lookups inside lifecycle operators
  *    (gather/produce closures), exactly the reference's API. Correct for
  *    genuinely small side inputs (the reference loads the whole store into
  *    a TreeMap per task too).
  *  - `toDF(spark)` + a broadcast join — the scale path. When the lookup is
  *    dense over the input, `df.join(broadcast(store.toDF(s)), ...)` lets
  *    Catalyst pick broadcast-hash (or shuffle if the "small" side grew);
  *    prefer this for anything bigger than configuration data.
  */
trait KeyValueStore[K, V] extends Serializable {
  /** Load the full store contents (driver side; result is closure-shipped). */
  def load(): Map[K, V]

  /** Point-lookup reader over the loaded contents. */
  def reader(): KeyValueStoreReader[K, V] = {
    val m = load()
    new KeyValueStoreReader[K, V] {
      def get(k: K): Option[V] = m.get(k)
    }
  }

  /** Relational (key, value) view for join-based lookup at scale. */
  def toDF(spark: SparkSession)(
      implicit ev: org.apache.spark.sql.Encoder[(K, V)]): DataFrame = {
    import spark.implicits._
    load().toSeq.toDS().toDF("key", "value")
  }
}

trait KeyValueStoreReader[K, V] extends Serializable {
  def get(k: K): Option[V]
  def containsKey(k: K): Boolean = get(k).isDefined
  def close(): Unit = {}
}

/** Driver-provided map, shipped through the closure — the direct analog of
  * `InMemoryMapKeyValueStore.java:81-119` (map serialized through job conf). */
final case class InMemoryMapKeyValueStore[K, V](map: Map[K, V])
    extends KeyValueStore[K, V] {
  def load(): Map[K, V] = map
}

/** Delimited text file: first-delimiter split, tab default, whole line with
  * no delimiter → key with empty value — semantics of
  * `TextFileKeyValueStore.java:46-83`. Later lines win on duplicate keys
  * (reference reads files in order into a map). */
final case class TextFileKeyValueStore(path: String, delimiter: String = "\t")
    extends KeyValueStore[String, String] {
  def load(): Map[String, String] = {
    val lines = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala
    lines.filter(_.nonEmpty).map { line =>
      val i = line.indexOf(delimiter)
      if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + delimiter.length))
    }.toMap
  }
}

/** Avro container file of records, indexed by a named key field — analog of
  * `AvroRecordKeyValueStore.java:44-83` (whole file into an in-memory map).
  * Values are the records' `valueField`, read as strings. */
final case class AvroRecordKeyValueStore(path: String, keyField: String,
                                         valueField: String)
    extends KeyValueStore[String, String] {
  def load(): Map[String, String] = {
    val reader = new DataFileReader[GenericRecord](
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.map { rec =>
      String.valueOf(rec.get(keyField)) -> String.valueOf(rec.get(valueField))
    }.toMap
    finally reader.close()
  }
}

/** Hadoop SequenceFile of Text key/values — analog of
  * `SeqFileKeyValueStore.java`. */
final case class SeqFileKeyValueStore(path: String)
    extends KeyValueStore[String, String] {
  def load(): Map[String, String] = {
    val conf = new Configuration()
    val reader = new SequenceFile.Reader(conf,
      SequenceFile.Reader.file(new Path(path)))
    try {
      val k = new Text(); val v = new Text()
      val out = Map.newBuilder[String, String]
      while (reader.next(k, v)) out += (k.toString -> v.toString)
      out.result()
    } finally reader.close()
  }
}

/** Point lookups against another table — analog of
  * `KijiTableKeyValueStore.java:54-122`. `load()` materializes the
  * projection on the driver (only sane for dim-sized tables — the same
  * constraint the reference's in-task TreeMap has); `asDF` is the scale
  * path and should be preferred in joins. */
final class TableKeyValueStore(@transient df: DataFrame,
                               keyCol: String, valueCol: String)
    extends KeyValueStore[String, String] {
  @transient private val projected = df.selectExpr(
    s"CAST($keyCol AS STRING) AS key", s"CAST($valueCol AS STRING) AS value")
  private val loaded: Map[String, String] =
    projected.collect().map(r => r.getString(0) -> r.getString(1)).toMap
  def load(): Map[String, String] = loaded
  def asDF: DataFrame = projected
}

/** Always-empty store (`EmptyKeyValueStore.java`): every get → None. */
final case class EmptyKeyValueStore[K, V]() extends KeyValueStore[K, V] {
  def load(): Map[K, V] = Map.empty
}

/** Must-be-overridden placeholder (`UnconfiguredKeyValueStore.java:149`):
  * using it without binding a real store is a validation error. */
final case class UnconfiguredKeyValueStore[K, V]() extends KeyValueStore[K, V] {
  def load(): Map[K, V] =
    throw new IllegalStateException(
      "UnconfiguredKeyValueStore must be overridden with a concrete store binding")
}
