package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** A driver-built GROUP-PARTITIONED seed set for L2 argmin: groups are
  * dense ints `0..nGroups-1` (coarse k-means cells), each holding its own
  * seed ids and flattened 2^20-scaled vectors (`start(g)..start(g+1)` is
  * group g's seed range; within a group, seed ids ascend). The companion
  * kernel scores a row against ONLY its own group's seeds — the
  * hierarchical-assignment counterpart of [[L2Centroids]]' global argmin.
  *
  * This is what keeps hierarchical SemDeDup's fine assignment at
  * n·(cellSize/target) DISTANCE OPS with zero joins: the equi-join
  * formulation shuffles two full vectors per candidate row (n^1.5 bytes —
  * measured as the residual superlinear term at 50×), while this ships
  * all Σ seeds ≈ k vectors once as a task-binary literal, the same
  * driver-state economics as flat k-means but with 1/coarseK of its
  * compute. */
final case class GroupedL2Seeds(start: Array[Int], svids: Array[Long],
                                flat: Array[Long], dim: Int) {
  require(dim > 0 && svids.length * dim == flat.length,
    s"inconsistent seed set: ${svids.length} seeds, ${flat.length} values, dim $dim")
  require(start.length >= 2 && start.head == 0 && start.last == svids.length,
    s"bad group offsets: ${start.length} entries, last ${start.last} vs ${svids.length}")
  def nGroups: Int = start.length - 1
  override def toString: String =
    s"GroupedL2Seeds(${nGroups} groups, ${svids.length} x $dim)"
}

object GroupedL2Seeds {
  /** Argmin of exact int64 squared L2 over group `g`'s seeds; seeds are
    * scanned in ascending svid order with a strict `<`, so equal-distance
    * ties keep the SMALLEST seed vid — the same winner as
    * `min(struct(dist, svid))` and the oracle's
    * `row_number() OVER (ORDER BY fdist, svid)`. */
  def nearest(v: ArrayData, g: Int, s: GroupedL2Seeds): Long = {
    require(g >= 0 && g < s.nGroups, s"group $g outside [0, ${s.nGroups})")
    val dim = s.dim
    val flat = s.flat
    var bestD = Long.MaxValue
    var bestId = -1L
    var si = s.start(g)
    val end = s.start(g + 1)
    require(si < end, s"group $g has no seeds — every nonempty cell seeds itself")
    while (si < end) {
      var d = 0L
      var i = 0
      val off = si * dim
      while (i < dim) {
        val t = v.getLong(i) - flat(off + i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; bestId = s.svids(si) }
      si += 1
    }
    bestId
  }
}

/** `grouped_nearest_l2(vec, group)`: the seed vid nearest (exact int64
  * squared L2, ties → smaller vid) to `vec` among the row's OWN group's
  * seeds in a driver-built [[GroupedL2Seeds]] — one fused codegen'd loop
  * per row, no (vector × seed) join. */
case class GroupedNearestL2(vec: Expression, group: Expression,
                            seeds: GroupedL2Seeds)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = group
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, group.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"grouped_nearest_l2 expects (array<bigint>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(v: Any, g: Any): Any =
    GroupedL2Seeds.nearest(v.asInstanceOf[ArrayData],
      g.asInstanceOf[Int], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, g) => {
      val sRef = ctx.addReferenceObj("groupedSeeds", seeds,
        classOf[GroupedL2Seeds].getName)
      s"${ev.value} = graft.plans.GroupedL2Seeds.nearest($v, $g, $sRef);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GroupedNearestL2 =
    copy(vec = newLeft, group = newRight)

  override def prettyName: String = "grouped_nearest_l2"
}
