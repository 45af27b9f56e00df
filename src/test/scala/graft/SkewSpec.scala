package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime re-plan safety net for hot join
  * keys at scale (complementing the deterministic salting operator,
  * RelationalOps.saltedSumCount, which covers skewed AGGREGATION keys
  * AQE does not help with). A 1000-executor join with one hot key would
  * otherwise serialize on a single straggler task; with
  * `spark.sql.adaptive.skewJoin` the oversized shuffle partition is split
  * into subpartitions at runtime and the matching side is replicated.
  * Asserted here on the adaptive physical plan (`isSkew=true` markers)
  * with thresholds scaled down to test-data size. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (skew markers in final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left side: 500K rows, 90% on one hot key; right side: unique keys
      val left = spark.range(500000L)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
          col("id").as("v"))
      val right = spark.range(1000L).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k").groupBy().agg(sum(col("v") + col("w")).as("s"))
      joined.collect() // runs the adaptive re-plan
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin(skew=true)") &&
        finalPlan.contains("AQEShuffleRead skewed"),
        s"expected AQE skew-split markers in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
