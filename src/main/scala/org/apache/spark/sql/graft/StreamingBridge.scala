package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** V1 streaming `Source.getBatch` must return a DataFrame whose logical
  * plan carries `isStreaming = true` (MicroBatchExecution asserts it);
  * `internalCreateDataFrame` is `private[sql]`, so this one-method
  * bridge lives in the sql package tree (same pattern as
  * [[GroupedTopKExec]]'s planner access). The micro-batch plan is
  * materialized through `queryExecution.toRdd` — lazy, executed only
  * when the streaming batch runs; batch-internal pushdown is already
  * done by the batch plan itself. */
object StreamingBridge {

  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse direction, for V1 `Sink.addBatch`: the micro-batch
    * DataFrame arrives backed by the incremental execution — re-plan it
    * as a plain batch frame over its own materialized RDD so ordinary
    * batch writers (VersionedTable.write/append/merge) can consume it. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  def active(): SparkSession = SparkSession.active
}
