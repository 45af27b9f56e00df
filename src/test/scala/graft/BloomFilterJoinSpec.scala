package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when one join side is small and
  * selectively filtered, Catalyst injects a bloom-filter subquery that
  * pre-filters the BIG side's shuffle input (`might_contain` in the
  * plan) — at 100 TB this drops most of the probe side's rows before
  * they are shuffled, the runtime analogue of static partition pruning.
  * Thresholds are scaled down to test-data size. */
class BloomFilterJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("selective small side injects a bloom filter on the big side's scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "50MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.01"
      val big = spark.read.parquet(s"$dir/lineitem.parquet")
      val small = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === "P") // selective creation side
      val joined = big.join(small, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter (might_contain) in the optimized plan:\n$plan")
      assert(joined.collect().nonEmpty) // and it still computes the right thing
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
