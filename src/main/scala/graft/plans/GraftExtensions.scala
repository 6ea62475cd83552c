package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering the engine's native expressions.
  *
  * Activate with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * on the session builder; `most_recent(versions)` then works in SQL and
  * `expr(...)` with full whole-stage codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("most_recent"),
      new ExpressionInfo(classOf[MostRecent].getName, "most_recent"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "most_recent takes exactly one argument")
        MostRecent(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "sorted_intersect_size takes two arguments")
        SortedIntersectSize(children.head, children(1))
      }))
  }
}
