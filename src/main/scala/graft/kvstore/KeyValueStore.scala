package graft.kvstore

import java.nio.charset.StandardCharsets

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
  * (reference reads files in order into a map).
  *
  * Opened through the Hadoop FileSystem API, so the path may be local OR
  * `hdfs://`/object-store — the reference ships store files to tasks from
  * HDFS via DistributedCache (`KM/kvstore/lib/FileStoreHelper.java`); the
  * Spark analog is a driver-side FS read broadcast through the closure. */
final case class TextFileKeyValueStore(path: String, delimiter: String = "\t")
    extends KeyValueStore[String, String] {
  def load(): Map[String, String] = {
    val p = new Path(path)
    val in = p.getFileSystem(new Configuration()).open(p)
    val bos = new java.io.ByteArrayOutputStream()
    org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, true)
    val content = new String(bos.toByteArray, StandardCharsets.UTF_8)
    // \r\n / \r / \n all terminate lines (readAllLines semantics — a CRLF
    // store file must not leak \r into keys or values)
    content.split("\r\n|\r|\n", -1).iterator.filter(_.nonEmpty).map { line =>
      val i = line.indexOf(delimiter)
      if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + delimiter.length))
    }.toMap
  }
}

/** Avro container file of records, indexed by a named key field — analog of
  * `AvroRecordKeyValueStore.java:44-83` (whole file into an in-memory map).
  * Values are the records' `valueField`, read as strings. Opened through
  * `FsInput`, so HDFS paths work as they do in the reference. */
final case class AvroRecordKeyValueStore(path: String, keyField: String,
                                         valueField: String)
    extends KeyValueStore[String, String] {
  def load(): Map[String, String] = {
    val reader = new DataFileReader[GenericRecord](
      new org.apache.avro.mapred.FsInput(new Path(path), new Configuration()),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.map { rec =>
      String.valueOf(rec.get(keyField)) -> String.valueOf(rec.get(valueField))
    }.toMap
    finally reader.close()
  }
}

/** Avro container of (key, value) records — analog of
  * `AvroKVRecordKeyValueStore.java:81-130`, which wraps
  * AvroRecordKeyValueStore with the fixed field name `key` and indexes the
  * `value` field by it (any additional top-level fields are ignored; it is
  * an error for the records to lack either field). */
final case class AvroKVRecordKeyValueStore(path: String)
    extends KeyValueStore[String, String] {
  def load(): Map[String, String] =
    AvroRecordKeyValueStore(path, "key", "value").load()
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
  * `KijiTableKeyValueStore.java:54-122` (bounded cache `:113`).
  *
  * Nothing is materialized at construction. The point-get path
  * (`reader()`/`load()`) lazily collects the projection on the driver —
  * guarded by a hard `maxRows` limit so a fact-sized table fails fast
  * instead of OOMing the driver — and ships it as a torrent
  * [[org.apache.spark.broadcast.Broadcast]] (fetched once per executor,
  * not serialized per task closure). The broadcast is forced during
  * closure serialization (`writeObject`), so a store that is built but
  * never read costs nothing.
  *
  * For lookups dense over a large input, prefer [[lookupJoin]]: a
  * broadcast-hash join Catalyst can re-plan (e.g. to shuffle-hash under
  * AQE if the "small" side grew) — the scale path the reference's
  * per-task HBase gets + LRU cache approximate. */
final class TableKeyValueStore(@transient df: DataFrame,
                               keyCol: String, valueCol: String,
                               maxRows: Int = TableKeyValueStore.DefaultMaxRows)
    extends KeyValueStore[String, String] {
  import org.apache.spark.broadcast.Broadcast
  @transient private val projected = df.selectExpr(
    s"CAST($keyCol AS STRING) AS key", s"CAST($valueCol AS STRING) AS value")
  private var bc: Broadcast[Map[String, String]] = _

  /** Driver-side guarded collect → broadcast; idempotent. */
  private def ensureLoaded(): Broadcast[Map[String, String]] = synchronized {
    if (bc == null) {
      val rows = projected.limit(maxRows + 1).collect()
      if (rows.length > maxRows) throw new IllegalStateException(
        s"TableKeyValueStore over $keyCol/$valueCol exceeds maxRows=$maxRows; " +
          "point-get loading is for dim-sized tables — use lookupJoin/asDF " +
          "(broadcast join) instead")
      bc = projected.sparkSession.sparkContext.broadcast(
        rows.map(r => r.getString(0) -> r.getString(1)).toMap)
    }
    bc
  }

  def load(): Map[String, String] = ensureLoaded().value

  /** Serialization happens driver-side when a task closure captures the
    * store — the last moment the DataFrame is still reachable. */
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    ensureLoaded()
    out.defaultWriteObject()
  }

  def asDF: DataFrame = projected

  /** Left-outer lookup join (the get-or-null semantics of a reader):
    * `input` rows keep all columns and gain `as` = store value for
    * `key`, null on a miss. The store side is marked broadcast. */
  def lookupJoin(input: DataFrame, key: org.apache.spark.sql.Column,
                 as: String = "value"): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val side = broadcast(projected
      .withColumnRenamed("value", as).withColumnRenamed("key", "__kv_key"))
    input.join(side, key.cast(org.apache.spark.sql.types.StringType)
      === col("__kv_key"), "left").drop("__kv_key")
  }
}

object TableKeyValueStore {
  /** Hard cap for driver materialization — dim-table sized. A store a
    * user actually needs point-gets on (config, small dims) is far under
    * this; anything over it belongs in a broadcast join. */
  val DefaultMaxRows: Int = 4 << 20
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
