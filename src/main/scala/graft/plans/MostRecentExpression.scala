package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: newest version of a versioned cell.
  *
  * `most_recent(array<struct<ts: long/timestamp, ...>>) → struct` — the
  * engine's most common read primitive (SURVEY §1.1 most_recent), as a
  * single-pass scan with full whole-stage-codegen support: no sort, no
  * per-row allocation beyond the winning struct copy, O(n) in the number
  * of versions. The composable alternatives (`sort_array` + `element_at`,
  * or `max(struct(...))`) either sort the array or re-order fields; this
  * expression keeps the cell struct as-is and picks the max-ts element
  * (ties: first occurrence wins, matching HBase scan order).
  *
  * Registered as a SQL function by [[GraftExtensions]].
  */
case class MostRecent(child: Expression) extends UnaryExpression {

  private def elementType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def dataType: DataType = elementType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.nonEmpty =>
      s.head.dataType match {
        case LongType | TimestampType | TimestampNTZType | IntegerType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"most_recent: first struct field (the timestamp) must be " +
            s"long/timestamp/int, got ${other.simpleString}")
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"most_recent expects array<struct<ts, ...>>, got ${other.simpleString}")
  }

  private lazy val tsIsInt = elementType.head.dataType == IntegerType
  private lazy val numFields = elementType.length

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = -1
    var bestTs = Long.MinValue
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, numFields)
        val t = if (tsIsInt) row.getInt(0).toLong else row.getLong(0)
        if (best < 0 || t > bestTs) { bestTs = t; best = i }
      }
      i += 1
    }
    if (best < 0) null else arr.getStruct(best, numFields).copy()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestTs = ctx.freshName("bestTs")
      val t = ctx.freshName("t")
      val getTs =
        if (tsIsInt) s"(long) $arr.getStruct($i, $numFields).getInt(0)"
        else s"$arr.getStruct($i, $numFields).getLong(0)"
      s"""
         |final int $n = $arr.numElements();
         |int $best = -1;
         |long $bestTs = Long.MIN_VALUE;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $t = $getTs;
         |    if ($best < 0 || $t > $bestTs) { $bestTs = $t; $best = $i; }
         |  }
         |}
         |if ($best < 0) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
         |} else {
         |  ${ev.value} = $arr.getStruct($best, $numFields).copy();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MostRecent =
    copy(child = newChild)

  override def prettyName: String = "most_recent"
}
