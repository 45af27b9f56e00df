package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: point-in-interval matching without a nested-loop
  * join. Spark has no native range-join strategy — a bare
  * `p BETWEEN lo AND hi` join condition has no equi-key, so the planner
  * falls back to BroadcastNestedLoopJoin (O(|points|·|intervals|)
  * comparisons, and undistributable once neither side broadcasts).
  *
  * Instead the value axis is cut into fixed-width buckets: every interval
  * explodes into the buckets it overlaps, every point maps to exactly one
  * bucket, and matching becomes an EQUI-join on the bucket id plus a
  * residual BETWEEN — a plain shuffled hash/sort-merge join both sides
  * co-partition on, AQE-skew-splittable like any other equi-join.
  * Candidate pairs drop from |P|·|I| to Σ_b |P_b|·|I_b|; with the bucket
  * width near the median interval span each interval lands in O(1)
  * buckets, so work scales with matches, not with the cross product.
  * (The same shape underlies grid-file spatial joins and the range-join
  * binning optimizations in commercial Spark runtimes.)
  *
  * Contract: `points` carries numeric column `point`; `intervals`
  * carries numerics `lo` ≤ `hi` (violating rows match nothing); the two
  * inputs share no other column names.
  */
object RangeJoin {

  /** Per-join width marker for the DECLARATIVE path
    * ([[graft.plans.RangeJoinRewrite]]): `.filter(widthHint(w))` on a
    * join input plants the [[graft.functions.RangeJoinWidthHint]]
    * predicate the rewrite reads — equivalent to
    * `.hint("range_join", w)` in a [[graft.GraftExtensions]] session,
    * but usable from any session (no hint-resolution rule required).
    * Evaluates to TRUE if left unconsumed, so it never changes results. */
  def widthHint(w: Long): org.apache.spark.sql.Column = {
    require(w > 0, s"width must be positive, got $w")
    org.apache.spark.sql.graft.NativeColumns.ofExpr(
      graft.functions.RangeJoinWidthHint(w))
  }

  def rangeJoin(points: DataFrame, intervals: DataFrame,
                point: String, lo: String, hi: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val pb = points
      .withColumn("__bucket", floor(col(point) / bucketWidth).cast("long"))
    val ib = intervals
      .filter(col(lo) <= col(hi))
      .withColumn("__bucket", explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(point).between(col(lo), col(hi)))
      .drop("__bucket")
  }

  /** Bucket width derived from the interval-span distribution: the
    * median span. With uniform point density dP, candidate pairs ≈
    * |I|·dP·(W + s̄) — shrinking W below the span scale s̄ buys almost
    * nothing (the floor |I|·dP·s̄ IS the match count) while interval
    * replication |I|·(1 + s̄/W) blows up; growing W past s̄ scans points
    * that can't match. W = median(s) caps both overhangs at ~2× their
    * floor, which is where the r4 hand-tuning landed (32→4 on spans of
    * 1..5 days, measured 2×). One approx-quantile aggregate over the
    * interval table (distributed, no collect beyond the scalar); the
    * width only shapes the plan — any positive value is correct. */
  def autoBucketWidth(intervals: DataFrame, lo: String, hi: String): Long = {
    val med = intervals.filter(col(lo) <= col(hi))
      .agg(percentile_approx((col(hi) - col(lo)).cast("double"),
        lit(0.5), lit(10000)).as("m"))
      .head.get(0)
    math.max(1L, Option(med).map(_.asInstanceOf[Double]).map(math.round).getOrElse(1L))
  }

  /** [[rangeJoin]] with the width self-tuned by [[autoBucketWidth]]. */
  def rangeJoinAuto(points: DataFrame, intervals: DataFrame,
                    point: String, lo: String, hi: String): DataFrame =
    rangeJoin(points, intervals, point, lo, hi,
      autoBucketWidth(intervals, lo, hi))
}
