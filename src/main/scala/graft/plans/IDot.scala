package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `idot(a, b)`: exact int64 dot product of two 2^20-scaled vectors —
  * one fused loop, zero allocation. The [[SqL2Dist]] sibling for the
  * cosine family: the composable `aggregate(zip_with(...))` form builds
  * an intermediate array PER EVALUATION, which is free on per-vector
  * columns but dominates per-CANDIDATE-PAIR cosines (semantic decontam's
  * n·|bench| nested loop measured 131 s at the 25× tier on the HOF form;
  * the within-cell SemDeDup prunes and LSH cosine reranks share the
  * shape). Every cosine in the engine routes through this via
  * `VectorFunctions.idot` — same int64 sum, same results. */
case class IDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"idot expects (array<bigint>, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.IDot.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "idot"
}

object IDot {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"idot: ragged vectors (${n} vs ${b.numElements()})")
    var d = 0L
    var i = 0
    while (i < n) {
      d += a.getLong(i) * b.getLong(i)
      i += 1
    }
    d
  }
}
