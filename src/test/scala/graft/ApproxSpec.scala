package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Approximate sketch aggregates vs their exact counterparts: HLL++
  * distinct counts within the configured relative error, approximate
  * percentiles within the accuracy-bounded rank error. These are the
  * constant-memory, mergeable substitutes for exact countDistinct /
  * percentile at corpus scale (an exact distinct over 10¹¹ keys is a
  * full shuffle of every key; an HLL sketch is a few KB per group). */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  test("approx_count_distinct(rsd=0.02) within 5% of exact per group") {
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact < 0.05,
        s"flag=${r.getString(0)} approx=$approx exact=$exact")
    }
  }

  test("approx_percentile(accuracy=1000) median within the p±1/accuracy rank band") {
    val rows = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx"),
        expr("percentile_approx(l_quantity, 0.49, 100000)").as("lo"),
        expr("percentile_approx(l_quantity, 0.51, 100000)").as("hi"))
      .collect()
    rows.foreach { r =>
      val (a, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(a >= lo && a <= hi, s"flag=${r.getString(0)} approx=$a outside [$lo,$hi]")
    }
  }
}
