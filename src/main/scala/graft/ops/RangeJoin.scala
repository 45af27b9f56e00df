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
}
