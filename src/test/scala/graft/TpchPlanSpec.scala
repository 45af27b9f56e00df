package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TpchQueries

/** Plan-shape guards for the TPC-H-derived suite — the properties that
  * matter at 100 TB, asserted on the post-AQE physical plan. Results
  * themselves are pinned by the DuckDB oracle (q_tpch_* registry rows);
  * this spec pins that the plans STAY the scale-right ones.
  */
class TpchPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Execute and return the final (post-AQE) physical plan text. */
  private def finalPlan(name: String): String = {
    val df = TpchQueries.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("no TPC-H query plans a cartesian product; BNLJ only for 1-row scalars") {
    // Q22 broadcasts its 1-row avg; Q2/Q11/Q20 broadcast the 1-row
    // supplier count their partsupp analogue keys on (and Q11 its
    // 1-row total) — each a single-row BroadcastNestedLoopJoin, the
    // scale-right scalar plan
    val scalarBnlj = Set("q_tpch_q22", "q_tpch_q2", "q_tpch_q11", "q_tpch_q20")
    for (name <- TpchQueries.queries.keys.toSeq.sorted) {
      val plan = finalPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
      if (!scalarBnlj.contains(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join:\n$plan")
    }
  }

  test("Q2 decorrelates min-cost via ONE window over ps_partkey and " +
    "ends in TakeOrderedAndProject; Q20 semi-joins its candidates") {
    val q2 = finalPlan("q_tpch_q2")
    assert(q2.contains("Window"), q2)
    assert(q2.contains("TakeOrderedAndProject"), q2)
    assert("SortMergeJoin".r.findAllIn(q2).isEmpty,
      s"Q2's dims must broadcast:\n$q2")
    val q20 = finalPlan("q_tpch_q20")
    assert(q20.contains("LeftSemi"), q20)
  }

  test("top-k queries end in TakeOrderedAndProject, not a global sort+limit") {
    for (name <- Seq("q_tpch_q3", "q_tpch_q10", "q_tpch_q18", "q_tpch_q21")) {
      val plan = finalPlan(name)
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name should push limit into TakeOrderedAndProject:\n$plan")
    }
  }

  test("Q4 EXISTS runs as a left-semi join; Q21 runs semi + anti") {
    assert(finalPlan("q_tpch_q4").contains("LeftSemi"))
    val q21 = finalPlan("q_tpch_q21")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"), q21)
  }

  test("star joins broadcast every dimension: Q5 and Q9 shuffle-join only fact tables") {
    for (name <- Seq("q_tpch_q5", "q_tpch_q9")) {
      val plan = finalPlan(name)
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      assert(bhj >= 3, s"$name should broadcast its dims (saw $bhj BHJ):\n$plan")
      // the only allowed shuffle joins are fact⋈fact (lineitem⋈orders);
      // at sf0.001 AQE may even convert that one to broadcast — assert
      // the dims never arrive via SortMergeJoin by bounding SMJ count
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      assert(smj <= 1, s"$name shuffle-joins a dimension (saw $smj SMJ):\n$plan")
    }
  }

  test("Q1/Q6 aggregate with map-side partial aggregation (two HashAggregate tiers)") {
    for (name <- Seq("q_tpch_q1", "q_tpch_q6")) {
      val plan = finalPlan(name)
      val aggs = "HashAggregate".r.findAllIn(plan).size
      assert(aggs >= 2, s"$name should partial-aggregate map-side:\n$plan")
    }
  }

  test("Q6 pushes the shipdate/discount/quantity conjunction into the parquet scan") {
    val df = TpchQueries.queries("q_tpch_q6")(spark, dir)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val li = scans.find(_.contains("lineitem")).getOrElse(fail("no lineitem scan"))
    assert(li.contains("PushedFilters") &&
      li.contains("l_shipdate") && li.contains("l_discount"),
      s"filters not pushed to scan:\n$li")
  }
}
