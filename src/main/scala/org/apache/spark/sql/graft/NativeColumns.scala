package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Expression ⇄ Column bridge for the engine's native Catalyst expressions
  * (lives in org.apache.spark.sql.* for access to the private[sql]
  * converters, like [[GroupedTopKApi]]). Direct construction — no session
  * function-registry dependency, so pure Column-builder code (graft.llm.*)
  * can emit native expressions without a SparkSession in scope. */
object NativeColumns {
  def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter.apply(c.node)
  def ofExpr(e: Expression): Column = ExpressionUtils.column(e)

  /** Native SimHash over an array of md5 hex digests ([[graft.functions.SimHashBits]]). */
  def simhashBits(arr: Column, bits: Int): Column =
    ofExpr(graft.functions.SimHashBits(toExpr(arr), bits))

  /** Native per-shingle md5→60-bit→mod-p hash ([[graft.functions.MinhashBaseHashes]]). */
  def minhashBaseHashes(arr: Column, p: Long): Column =
    ofExpr(graft.functions.MinhashBaseHashes(toExpr(arr), p))

  /** Rolling Rabin–Karp hashes of every sliding w-token window
    * ([[graft.functions.RollingHashWindows]]). */
  def rollingHash(arr: Column, w: Int): Column =
    ofExpr(graft.functions.RollingHashWindows(toExpr(arr), w))

  /** 0-based rank among the partition's NULL rows of `c`
    * ([[graft.functions.NullRankInPartition]]) — identity assignment's
    * columnar kernel. */
  def nullRank(c: Column): Column =
    ofExpr(graft.functions.NullRankInPartition(toExpr(c)))

  /** Pin `df`'s physical execution: re-plans the frame over its
    * materialized `toRdd`, so every downstream job (a stats pass, the
    * final write) sees the SAME partitioning and partition contents —
    * the determinism persist() used to buy, without storing a byte
    * (shuffle stages are reused through Spark's shuffle files; scans
    * re-execute, which is the right trade at any scale). */
  def freeze(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sp = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    sp.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }

  /** DataFrame over an already-resolved logical plan (Dataset.ofRows is
    * private[sql]) — lets caller-side code bake a manually-applied
    * optimizer rewrite into the plan every downstream QueryExecution
    * (count(), write) inherits, with no session-state mutation. */
  def ofPlan(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until every queued SparkListener event is delivered
    * (`listenerBus` is private[spark]) — listener-based metric
    * assertions (records/bytes read across an action) are complete
    * only after the bus drains. */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
