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
}
