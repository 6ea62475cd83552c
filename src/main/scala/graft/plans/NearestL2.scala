package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** A driver-built k-means centroid set for L2 assignment: cluster ids
  * ascending, vectors flattened (`flat(i*dim + j)` = lane j of centroid i,
  * 2^20-scaled longs). The companion kernel is the assignment argmin of
  * Lloyd's algorithm — the innermost loop of every k-means round.
  *
  * Same broadcast-literal shape as [[IvfCentroids]]: a few k·dim longs
  * riding the task binary, while the corpus never materializes a
  * (vector × centroid) row.
  */
final case class L2Centroids(ids: Array[Int], flat: Array[Long], dim: Int) {
  require(dim > 0 && ids.length * dim == flat.length,
    s"inconsistent centroid set: ${ids.length} ids, ${flat.length} values, dim $dim")
  require(ids.length > 0, "empty centroid set")
  override def toString: String = s"L2Centroids(${ids.length} x $dim)"
}

object L2Centroids {
  /** Argmin of exact int64 squared L2 over the centroid set; ids are
    * scanned ascending with a strict `<`, so equal-distance ties keep the
    * SMALLEST cluster id — the same winner as `least(struct(d, c), ...)`
    * lexicographic comparison and the oracle's
    * `row_number() OVER (ORDER BY dist, cluster)`. Returns (dist, id). */
  def nearest(v: ArrayData, c: L2Centroids): InternalRow = {
    val dim = c.dim
    val flat = c.flat
    var bestD = Long.MaxValue
    var bestC = 0
    var ci = 0
    while (ci < c.ids.length) {
      var d = 0L
      var i = 0
      val off = ci * dim
      while (i < dim) {
        val t = v.getLong(i) - flat(off + i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; bestC = c.ids(ci) }
      ci += 1
    }
    InternalRow(bestD, bestC)
  }
}

/** `nearest_l2(vec)`: the (distance, cluster) of the nearest centroid in a
  * driver-built [[L2Centroids]] set — one fused codegen'd loop per vector.
  *
  * Replaces an interpreted `least(struct(fold, c), ...)` over k candidate
  * expressions: the higher-order-function fold pays closure overhead per
  * LANE per centroid (k·dim boxed steps per row), where this kernel is
  * k·dim primitive ops. At the corpus-scaled k the SemDeDup/PQ paths use
  * (k up to 2^10), that difference is the whole assignment cost. */
case class NearestL2Centroid(vec: Expression, centroids: L2Centroids)
    extends UnaryExpression {

  override def child: Expression = vec
  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("c", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_l2 expects array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    L2Centroids.nearest(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("l2Centroids", centroids,
        classOf[L2Centroids].getName)
      s"${ev.value} = graft.plans.L2Centroids.nearest($v, $cRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestL2Centroid =
    copy(vec = newChild)

  override def prettyName: String = "nearest_l2"
}
