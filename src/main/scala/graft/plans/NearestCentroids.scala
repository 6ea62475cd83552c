package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** An immutable, driver-built centroid set: ids ascending, vectors flattened
  * (`flat(i*dim + j)` = component j of centroid i, 2^20-scaled longs), norms
  * pre-computed with the exact double ops of `VectorFunctions.vnorm`
  * (`sqrt((double) Σ c²)`) so cosines computed against it are bit-identical
  * to the DataFrame path.
  *
  * This is the "train once offline, broadcast to the query" IVF shape
  * (FAISS-style): at 100 TB the centroid set is a few MB riding the task
  * binary, while the corpus never materializes a (vector × centroid) row.
  */
final case class IvfCentroids(ids: Array[Long], flat: Array[Long],
                              norms: Array[Double], dim: Int) {
  require(ids.length * dim == flat.length && ids.length == norms.length,
    s"inconsistent centroid set: ${ids.length} ids, ${flat.length} values, dim $dim")
  def count: Int = ids.length
  override def toString: String = s"IvfCentroids(${ids.length} x $dim)"
}

object IvfCentroids {
  /** Top-`n` centroid ids for scaled vector `v` with norm `nn`, ordered by
    * (cosine DESC, centroid id ASC) — the argmax/probe kernel. One tight
    * dot-product loop per centroid, insertion into a size-n buffer; ids
    * are scanned ascending so equal-cosine ties keep the smaller id, the
    * same winner as `row_number() OVER (ORDER BY ccos DESC, c_id ASC)`. */
  def topN(v: ArrayData, nn: Double, c: IvfCentroids, n: Int): ArrayData = {
    val cCount = c.count
    val dim = c.dim
    val flat = c.flat
    val take = math.min(n, cCount)
    val outIds = new Array[Long](take)
    val outCos = new Array[Double](take)
    var filled = 0
    var ci = 0
    while (ci < cCount) {
      var dot = 0L
      var i = 0
      val off = ci * dim
      while (i < dim) { dot += v.getLong(i) * flat(off + i); i += 1 }
      val cos = dot.toDouble / (nn * c.norms(ci))
      // Double.compare gives the total order of Spark's max(struct)/window
      // DESC and DuckDB's ORDER BY DESC: NaN sorts as the LARGEST value
      // (a zero-norm vector or centroid cosines to NaN) — a plain >= would
      // invert that and diverge from the oracle on degenerate vectors.
      var p = 0
      while (p < filled && java.lang.Double.compare(outCos(p), cos) >= 0) p += 1
      if (p < take) {
        var q = math.min(filled, take - 1)
        while (q > p) { outCos(q) = outCos(q - 1); outIds(q) = outIds(q - 1); q -= 1 }
        outCos(p) = cos
        outIds(p) = c.ids(ci)
        if (filled < take) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(if (filled == take) outIds else outIds.take(filled))
  }
}

/** `nearest_centroids(vec, norm)`: top-`n` nearest centroid ids of a scaled
  * vector against a broadcast [[IvfCentroids]] set — full codegen, no
  * (vector × centroid) join. Replaces the broadcast-join + partial-agg
  * argmax of IVF assignment (n=1) and the probe-list window (n=nprobe):
  * the join produced numCentroids rows per vector just to fold them back
  * to one; this is one expression call per vector. */
case class NearestCentroids(vec: Expression, norm: Expression,
                            centroids: IvfCentroids, n: Int)
    extends BinaryExpression {
  require(n >= 1, s"nearest_centroids needs n >= 1, got $n")

  override def left: Expression = vec
  override def right: Expression = norm
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = vec.nullable || norm.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, norm.dataType) match {
      case (ArrayType(LongType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroids expects (array<bigint>, double), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(v: Any, nn: Any): Any =
    IvfCentroids.topN(v.asInstanceOf[ArrayData],
      nn.asInstanceOf[java.lang.Double], centroids, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nn) => {
      val cRef = ctx.addReferenceObj("ivfCentroids", centroids,
        classOf[IvfCentroids].getName)
      s"${ev.value} = graft.plans.IvfCentroids.topN($v, $nn, $cRef, $n);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroids =
    copy(vec = newLeft, norm = newRight)

  override def prettyName: String = "nearest_centroids"
}
