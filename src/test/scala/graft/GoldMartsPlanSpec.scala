package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.marts.GoldMarts

/** Plan-shape guards for the gold marts — the properties that matter at
  * 100 TB, asserted on the physical plan so a refactor can't silently
  * regress them. */
class GoldMartsPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("mart_dept grand total derives from agg0: star join scanned ONCE") {
    val df = GoldMarts.martNationPerformance(
      spark.read.parquet(s"$dir/lineitem.parquet"),
      spark.read.parquet(s"$dir/orders.parquet"),
      spark.read.parquet(s"$dir/customer.parquet"),
      spark.read.parquet(s"$dir/nation.parquet"))
    val plan = df.queryExecution.executedPlan.toString
    // the pct-of-total must NOT re-execute the lineitem⋈orders⋈customer⋈
    // nation subtree: each base table appears exactly once in the plan
    for (t <- Seq("lineitem.parquet", "orders.parquet", "customer.parquet")) {
      val n = t.r.findAllIn(plan).size
      assert(n == 1, s"$t scanned $n times (expected 1):\n$plan")
    }
    // and the result is still correct: pct_of_total_items sums to ~100
    val pcts = df.select("pct_of_total_items").collect().map(_.getDouble(0))
    assert(math.abs(pcts.sum - 100.0) < 0.1, s"pcts sum to ${pcts.sum}")
  }
}
