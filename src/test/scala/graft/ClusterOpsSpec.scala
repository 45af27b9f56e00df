package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.ClusterOps

/** Connected-components cluster assignment (the pair-list → keep-one-per-
  * cluster step of a dedup pipeline). */
class ClusterOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain, triangle, and singleton components resolve to min-id labels") {
    // components: {1,2,3,4} (chain needing >1 propagation round),
    // {10,11,12} (triangle), {20,21} (pair); docs 30,31 are edge-free.
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val docs = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L, 31L))
      .toDF("doc_id")
    val out = ClusterOps.assignClusters(docs, edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(d => out(d)._1 == 1L))
    assert(Seq(10L, 11L, 12L).forall(d => out(d)._1 == 10L))
    assert(Seq(20L, 21L).forall(d => out(d)._1 == 20L))
    assert(out(30L) == (30L, true) && out(31L) == (31L, true))
    // exactly one representative per cluster
    val reps = out.collect { case (d, (c, true)) => (d, c) }
    assert(reps.toSet == Set((1L, 1L), (10L, 10L), (20L, 20L), (30L, 30L), (31L, 31L)))
  }

  test("empty edge set: every doc is its own singleton cluster") {
    val docs = Seq(5L, 6L).toDF("doc_id")
    val edges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = ClusterOps.assignClusters(docs, edges).collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(1) && r.getBoolean(2)))
  }
}
