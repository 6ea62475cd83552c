package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Schema-migration pivoter — the `KijiCellRewriter` analog
  * (`KM/pivot/KijiCellRewriter.java:183-269`): migrate every cell of a
  * column through a map of conversion rules applied to FIXPOINT, so chained
  * migrations (v1 → v2 → v3) converge in one pass regardless of which
  * schema generation each cell was written under.
  *
  * The reference's rules map Avro schema → Avro schema
  * (`:224-237` fixpoint loop, `:250-269` re-encode); here a rule maps a
  * Catalyst DataType to (targetType, Column ⇒ Column conversion). Cells
  * whose type has no rule pass through unchanged (`:207` no-op path).
  * Counters mirror the reference's enum (`:95-101` CELLS_PROCESSED /
  * CELLS_REWRITTEN).
  *
  * Columnar execution: because a table column has ONE physical type, the
  * fixpoint resolves at plan-build time on the driver — the executors run a
  * single composed, codegen-friendly cast chain (no per-row schema
  * resolution, unlike the reference's per-cell datum re-encode).
  */
object CellRewriter {

  final case class Rule(from: DataType, to: DataType, convert: Column => Column)

  /** Compose the rule chain for `startType` to fixpoint. Cycles are a
    * configuration error (the reference would loop forever; we throw). */
  def resolveChain(startType: DataType, rules: Seq[Rule]): Seq[Rule] = {
    val byFrom = rules.map(r => r.from -> r).toMap
    val chain = Seq.newBuilder[Rule]
    var t = startType
    var seen = Set[DataType](t)
    while (byFrom.contains(t)) {
      val r = byFrom(t)
      chain += r
      t = r.to
      if (seen.contains(t))
        throw new IllegalArgumentException(s"cell-rewrite rule cycle at $t")
      seen += t
    }
    chain.result()
  }

  /** Rewrite `valueCol` of a cell table through the rules' fixpoint. */
  def rewrite(cells: DataFrame, valueCol: String, rules: Seq[Rule]): DataFrame = {
    val startType = cells.schema(valueCol).dataType
    val chain = resolveChain(startType, rules)
    val rewritten = chain.foldLeft(col(valueCol))((c, r) => r.convert(c))
    cells.withColumn(valueCol, rewritten)
  }

  // ── record-schema evolution ──────────────────────────────────────────────

  /** One generation step of a record migration: cells written under schema
    * generation `fromVersion` are transformed by `migrate` (typically
    * `withField`/`dropFields` on the struct) into `toVersion`'s shape —
    * the add/rename/drop field rules of the reference's Avro rewriter
    * (`KM/pivot/KijiCellRewriter.java:224-237` rule map, `:250-269`
    * re-encode under the new writer schema). */
  final case class RecordRule(fromVersion: Int, toVersion: Int,
                              migrate: Column => Column)

  /** Chain of rules from `start` to fixpoint; cycles throw (the reference
    * would loop forever re-encoding). */
  def resolveRecordChain(start: Int, rules: Seq[RecordRule]): Seq[RecordRule] = {
    val byFrom = rules.map(r => r.fromVersion -> r).toMap
    require(byFrom.size == rules.size,
      "ambiguous record rules: multiple rules share a fromVersion")
    val chain = Seq.newBuilder[RecordRule]
    var v = start
    var seen = Set(v)
    while (byFrom.contains(v)) {
      val r = byFrom(v)
      chain += r
      v = r.toVersion
      if (seen.contains(v))
        throw new IllegalArgumentException(s"record-rewrite rule cycle at v$v")
      seen += v
    }
    chain.result()
  }

  /** Migrate a multi-generation record column to fixpoint.
    *
    * Spark-first shape for "cells written under different writer schemas":
    * the column's physical type is the SUPERSET struct of all generations
    * (what parquet schema-merge produces), fields absent in a generation
    * are null, and `versionCol` tags the writer generation — so the
    * reference's per-cell writer-schema dispatch (`:250` decode with writer
    * schema) becomes one flat CASE WHEN on the tag, with each branch the
    * whole v→fixpoint chain composed at plan-build time on the driver.
    * Executors run a single codegen'd expression; nothing resolves
    * per row. Cells whose version has no rule pass through (`:207`). */
  def rewriteRecords(cells: DataFrame, versionCol: String, valueCol: String,
                     rules: Seq[RecordRule]): DataFrame = {
    val startVersions = rules.map(_.fromVersion).distinct.sorted
    val (newVal, newVer) = startVersions.foldLeft((col(valueCol), col(versionCol))) {
      case ((valAcc, verAcc), from) =>
        val chain = resolveRecordChain(from, rules)
        val migrated = chain.foldLeft(col(valueCol))((c, r) => r.migrate(c))
        (when(col(versionCol) === from, migrated).otherwise(valAcc),
         when(col(versionCol) === from, lit(chain.last.toVersion)).otherwise(verAcc))
    }
    cells.withColumn(valueCol, newVal).withColumn(versionCol, newVer)
  }
}
