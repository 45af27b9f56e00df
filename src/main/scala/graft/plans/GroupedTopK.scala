package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}

/** Logical node: keep the first `k` rows per group in `sortOrder`.
  *
  * Built-in Spark expresses this as `row_number().over(Window...)` +
  * filter, which fully sorts every group after shuffling ALL input rows.
  * This operator (planned by [[graft.plans.GroupedTopKStrategy]]) runs a
  * bounded-heap partial pass per input partition BEFORE the shuffle, so at
  * most k rows per (key, partition) travel the wire — at 100 TB with a
  * selective k this cuts shuffle IO by orders of magnitude. Custom-operator
  * preference (c) from the build brief: LogicalPlan + Strategy + SparkPlan,
  * used only because no built-in expresses partial per-group top-k. */
case class GroupedTopK(
    groupCols: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}
