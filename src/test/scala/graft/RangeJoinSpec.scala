package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import graft.ops.RangeJoin

/** Bucketed range join: the point of the operator is the PLAN — matching
  * point-in-interval through an equi-join on bucket cells instead of the
  * BroadcastNestedLoopJoin that a raw BETWEEN join degenerates to. Both
  * halves asserted: no nested-loop/cartesian node anywhere, and results
  * identical to the naive cross-product filter. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pointsAndIntervals() = {
    val dir = "/root/testdata/sf0.001"
    val pts = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), unix_date(to_date(col("o_orderdate"))).as("p"))
    val ivs = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") <= 5.0)
      .select(col("l_orderkey"), col("l_linenumber"),
        unix_date(to_date(col("l_shipdate"))).as("lo"),
        (unix_date(to_date(col("l_shipdate"))) + col("l_quantity").cast("long")).as("hi"))
    (pts, ivs)
  }

  private def nestedLoopNodes(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case b: BroadcastNestedLoopJoinExec => Seq(b)
    case c: org.apache.spark.sql.execution.joins.CartesianProductExec => Seq(c)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      nestedLoopNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      nestedLoopNodes(q.plan)
  }.flatten

  test("equi-join plan (no nested loop), results identical to naive filter") {
    val (pts, ivs) = pointsAndIntervals()
    val got = RangeJoin.rangeJoin(pts, ivs, "p", "lo", "hi", 32L)

    // plan: the bucket key makes this a hash-partitionable equi-join
    got.count() // materialize so AQE finalizes the plan
    assert(nestedLoopNodes(got.queryExecution.executedPlan).isEmpty,
      "bucketed range join must not plan a nested-loop or cartesian join")

    // and the raw BETWEEN join really does degenerate without the op —
    // the counterfactual that justifies the bucketing
    val naive = pts.join(ivs, col("p").between(col("lo"), col("hi")))
    assert(nestedLoopNodes(naive.queryExecution.executedPlan).nonEmpty,
      "expected the un-bucketed BETWEEN join to plan a nested loop")

    // semantics: identical (point, interval) match set
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("o_orderkey", "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(key(got) == key(naive))
    assert(key(got).nonEmpty)
  }

  test("auto width lands at the span scale; candidates within 2x of hand-tuned") {
    val (pts, ivs) = pointsAndIntervals()
    val auto = RangeJoin.autoBucketWidth(ivs, "lo", "hi")
    // spans here are 1..5 days; the median must land in that range (the
    // r4 hand-tuning landed on 4 after measuring 32 vs 4 at 2×)
    assert(auto >= 1L && auto <= 5L, s"auto width $auto outside the span scale")
    // the cost the width controls: equi-join candidate pairs BEFORE the
    // residual BETWEEN — auto must be within 2× of the hand-tuned width
    def candidates(w: Long): Long = {
      val pb = pts.withColumn("__bucket", floor(col("p") / w).cast("long"))
      val ib = ivs.filter(col("lo") <= col("hi"))
        .withColumn("__bucket", explode(sequence(
          floor(col("lo") / w).cast("long"), floor(col("hi") / w).cast("long"))))
      pb.join(ib, Seq("__bucket")).count()
    }
    val cAuto = candidates(auto)
    val cHand = candidates(4L)
    assert(cAuto <= 2L * cHand,
      s"auto width $auto produced $cAuto candidates vs hand-tuned $cHand")
    // and the result is width-invariant
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("o_orderkey", "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(key(RangeJoin.rangeJoinAuto(pts, ivs, "p", "lo", "hi")) ==
      key(RangeJoin.rangeJoin(pts, ivs, "p", "lo", "hi", 4L)))
  }

  test("interval spanning multiple buckets still matches every inner point") {
    import spark.implicits._
    val pts = Seq((1L, 5L), (2L, 64L), (3L, 99L), (4L, 100L)).toDF("pid", "p")
    val ivs = Seq((10L, 0L, 99L), (11L, 98L, 97L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, ivs, "p", "lo", "hi", 32L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // interval 10 spans buckets 0..3 and catches points 5, 64, 99 but not
    // 100; interval 11 is inverted (lo > hi) and matches nothing
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L)))
  }
}
