package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_intersect_size(a, b[, minJaccard])`: intersection cardinality of
  * two SORTED DISTINCT long arrays via a two-pointer merge — O(n+m), zero
  * allocation, full codegen.
  *
  * This is the hot inner op of the LSH rerank: Jaccard =
  * `inter / (|a| + |b| - inter)`, so one merge replaces the
  * `array_intersect` + `array_union` pair, each of which builds a hash set
  * PER ROW (~60 µs for 150-element arrays vs ~2 µs for the merge — the
  * rerank runs once per candidate pair, millions of times at scale).
  *
  * With `minJaccard = Some(t)` the merge ABORTS (returning -1) as soon as
  * the best still-possible intersection `n + min(remaining)` drops below
  * the smallest count that could pass `inter/union >= t` — most candidate
  * pairs are low-overlap, so their merges stop early. The abort bound
  * `floor(t·(|a|+|b|)/(1+t))` is a conservative (never-above) bound on
  * that minimal passing count even under double rounding, so a pair the
  * threshold filter would keep ALWAYS runs to completion and returns its
  * exact count — -1 only ever replaces values the filter provably drops.
  *
  * Inputs MUST be sorted ascending and duplicate-free (`array_sort ∘
  * array_distinct`, done once at signature-build time); the result is
  * undefined otherwise.
  */
case class SortedIntersectSize(left: Expression, right: Expression,
                               minJaccard: Option[Double] = None)
    extends BinaryExpression {
  require(minJaccard.forall(t => t > 0 && t <= 1),
    s"minJaccard must be in (0, 1], got $minJaccard")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  private def requiredFor(nx: Int, ny: Int): Int = minJaccard match {
    case Some(t) => math.floor(t * (nx + ny) / (1.0 + t)).toInt
    case None => 0
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val nx = x.numElements(); val ny = y.numElements()
    val required = requiredFor(nx, ny)
    while (i < nx && j < ny) {
      if (n + math.min(nx - i, ny - j) < required) return -1
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { n += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val req = ctx.freshName("req"); val rem = ctx.freshName("rem")
      val t = minJaccard.getOrElse(0.0)
      val reqInit =
        if (minJaccard.isDefined)
          s"final int $req = (int) Math.floor($t * ($nx + $ny) / (1.0 + $t));"
        else s"final int $req = 0;"
      val abortCheck =
        if (minJaccard.isDefined)
          s"""final int $rem = ($nx - $i) < ($ny - $j) ? ($nx - $i) : ($ny - $j);
             |  if (${ev.value}_n + $rem < $req) { ${ev.value}_n = -1; break; }""".stripMargin
        else ""
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |$reqInit
         |int $i = 0; int $j = 0; int ${ev.value}_n = 0;
         |while ($i < $nx && $j < $ny) {
         |  $abortCheck
         |  final long $xi = $a.getLong($i);
         |  final long $yj = $b.getLong($j);
         |  if ($xi == $yj) { ${ev.value}_n++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}_n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_size"
}
