package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `sq_l2_dist(a, b)`: exact int64 squared L2 distance between two
  * 2^20-scaled vectors — ONE fused loop over the two arrays, the same
  * arithmetic as [[GroupedL2Seeds.nearest]]'s inner loop.
  *
  * Exists because the composable form
  * (`aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), ...)`) materializes
  * an intermediate 64-element array PER EVALUATION — free on per-vector
  * columns, but the dominant cost when the expression runs per CANDIDATE
  * PAIR of a join (millions of evaluations, e.g. the distributed fine
  * assignment of hierarchical SemDeDup). This kernel allocates nothing. */
case class SqL2Dist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_l2_dist expects (array<bigint>, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SqL2Dist.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SqL2Dist.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqL2Dist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq_l2_dist"
}

object SqL2Dist {
  def dist(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"sq_l2_dist: ragged vectors (${n} vs ${b.numElements()})")
    var d = 0L
    var i = 0
    while (i < n) {
      val t = a.getLong(i) - b.getLong(i)
      d += t * t
      i += 1
    }
    d
  }
}
