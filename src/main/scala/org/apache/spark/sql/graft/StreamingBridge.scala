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

  def active(): SparkSession = SparkSession.active
}
