package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import graft.plans.GroupedTopK

/** Physical grouped top-k: one bounded max-heap of size k per key.
  *
  * Planned twice by [[GroupedTopKStrategy]]: a `partial = true` instance
  * with no distribution requirement (runs on raw input partitions,
  * emitting ≤ k rows per key per partition) under a `partial = false`
  * instance requiring ClusteredDistribution(groupCols) — EnsureRequirements
  * inserts the hash exchange between them, so only the partial winners are
  * shuffled. The same partial/final split Spark applies to aggregates,
  * applied to per-group top-k.
  *
  * Memory: O(keys-per-partition × k) rows — bounded by construction; no
  * sort of full groups anywhere. */
case class GroupedTopKExec(
    groupCols: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupCols))

  override protected def doExecute(): RDD[InternalRow] = {
    val order = sortOrder
    val out = child.output
    val groups = groupCols
    val limit = k
    child.execute().mapPartitions { it =>
      val ord = RowOrdering.create(order, out)
      val keyProj = UnsafeProjection.create(groups, out)
      // max-heap per key: head = worst retained row in sort order
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      for (row <- it) {
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          new mutable.PriorityQueue[InternalRow]()(ord))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      heaps.valuesIterator.flatMap(_.toArray.sorted(ord).iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, s, k, child) =>
      val partialExec = GroupedTopKExec(g, s, k, planLater(child), partial = true)
      GroupedTopKExec(g, s, k, partialExec, partial = false) :: Nil
    case _ => Nil
  }
}

/** Column-API entry point (lives in org.apache.spark.sql.* for access to
  * Dataset.ofRows; users call graft.ops.GroupedTopKOps). */
object GroupedTopKApi {
  def groupedTopK(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    }
    build(df, keys, order, k)
  }

  /** Plan construction WITHOUT the experimental-registry fallback — the
    * path for sessions carrying `spark.sql.extensions=graft.GraftExtensions`,
    * where the strategy is already injected at session build. Planning
    * fails (no strategy for GroupedTopK) on an unconfigured session, which
    * is exactly what ExtensionsSpec exploits to prove the injection. */
  def build(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    // eager ColumnNode -> catalyst conversion (ExpressionUtils.expression
    // returns a lazy, non-serializable bridge that breaks task shipping)
    def toExpr(c: Column): Expression =
      ColumnNodeToExpressionConverter.apply(c.node)
    val sortOrders = order.map(toExpr).map {
      case so: SortOrder => so
      case e: Expression => SortOrder(e, Ascending)
    }
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      GroupedTopK(keys.map(toExpr), sortOrders, k,
        df.queryExecution.analyzed))
  }
}
