package graft.dml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The DML surface: `put` / `deleteCell` / `deleteColumn` / `deleteFamily` /
  * `deleteRow` with HBase tombstone semantics, re-expressed as a change feed
  * merged into a long-format cell table.
  *
  * Reference anchors (`KM/impl/HFileWriterContext.java`):
  *  - put → encode cell (`:132-155`)
  *  - deleteRow(upToTs) → one DeleteFamily per locality group (`:168-196`)
  *  - deleteFamily(upToTs) (`:224-359`)
  *  - deleteColumn(upToTs) / deleteCell(exact ts) (`:363-405`)
  *
  * A tombstone with timestamp T masks cells with ts <= T (exact-ts for
  * deleteCell), including puts in the same batch — HBase resolves purely by
  * (key, timestamp), not arrival order. The merge below reproduces that:
  * puts are unioned into the cell set BEFORE masking.
  *
  * Scale shape: the mask is a left_anti join keyed on entity_id (+scope
  * conditions). Tombstone sets are usually dim-sized, so the join broadcasts;
  * if a change feed ever carries billions of tombstones the same plan
  * degrades gracefully to a shuffled hash join on entity_id.
  */
object Dml {

  val Ops = Seq("put", "delete_cell", "delete_column", "delete_family", "delete_row")

  /** Canonical cell schema: (entity_id, family, qualifier, ts, value).
    * Canonical change schema: (entity_id, family, qualifier, op, ts, value)
    * where `ts` is the put timestamp, the exact ts for delete_cell, or the
    * inclusive upToTimestamp for scoped deletes; family/qualifier are null
    * outside the op's scope. */
  def applyChanges(cells: DataFrame, changes: DataFrame): DataFrame = {
    val puts = changes.filter(col("op") === "put")
      .select(col("entity_id"), col("family"), col("qualifier"), col("ts"), col("value"))
    val tombs = changes.filter(col("op") =!= "put")
      .select(col("entity_id").as("t_eid"), col("family").as("t_fam"),
        col("qualifier").as("t_qual"), col("op").as("t_op"), col("ts").as("t_ts"))

    val all = cells.unionByName(puts)
    val scopeMatches: Column =
      (col("t_op") === "delete_row") ||
      (col("t_op") === "delete_family" && col("family") === col("t_fam")) ||
      (col("t_op").isin("delete_column", "delete_cell") &&
        col("family") === col("t_fam") && col("qualifier") === col("t_qual"))
    val tsMatches: Column =
      when(col("t_op") === "delete_cell", col("ts") === col("t_ts"))
        .otherwise(col("ts") <= col("t_ts"))
    // No broadcast hint: tombstone sets are usually dim-sized and AQE
    // broadcasts them from the observed size; a forced hint would instead
    // build a billion-row tombstone feed on the driver.
    all.join(tombs,
      col("entity_id") === col("t_eid") && scopeMatches && tsMatches,
      "left_anti")
  }

  // ── change-record constructors (driver-side sugar; `K` is the entity-id
  // type — Long for simple keys, String for composite encoded keys) ───────
  case class Change[K, V](entity_id: K, family: String, qualifier: String,
                          op: String, ts: Long, value: V)
  def put[K, V](eid: K, fam: String, qual: String, ts: Long, v: V): Change[K, V] =
    Change(eid, fam, qual, "put", ts, v)
  def deleteCell[K, V](eid: K, fam: String, qual: String, ts: Long, nullV: V): Change[K, V] =
    Change(eid, fam, qual, "delete_cell", ts, nullV)
  def deleteColumn[K, V](eid: K, fam: String, qual: String, upToTs: Long, nullV: V): Change[K, V] =
    Change(eid, fam, qual, "delete_column", upToTs, nullV)
  def deleteFamily[K, V](eid: K, fam: String, upToTs: Long, nullV: V): Change[K, V] =
    Change(eid, fam, null, "delete_family", upToTs, nullV)
  def deleteRow[K, V](eid: K, upToTs: Long, nullV: V): Change[K, V] =
    Change(eid, null, null, "delete_row", upToTs, nullV)
}
