package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.LabelProp

/** Bucketed label propagation: community recovery on hand-checkable
  * graphs, exact equality with a serial replay of the synchronous
  * deterministic-tie-break recurrence, and the per-round plan properties
  * shared with PageRank (edge side exchange-free, labels never
  * broadcast). */
class LabelPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two cliques with a weak bridge split into two communities") {
    val clique = (ns: Seq[Long]) =>
      for (a <- ns; b <- ns if a < b) yield (a, b, 10L)
    val pairs = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)) :+
      ((3L, 10L, 1L))).toDF("a", "b", "w")
    val out = LabelProp.run(pairs, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), s"got $out")
  }

  test("random graphs match a serial replay of the recurrence") {
    def serial(pairs: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
      // symmetrize + collapse parallel edges, as prepare() does
      val und = (pairs.filter(p => p._1 != p._2).flatMap { case (a, b, w) =>
        Seq(((a, b), w), ((b, a), w)) })
        .groupBy(_._1).map { case ((s, d), es) => (s, d, es.map(_._2).sum) }.toSeq
      val nodes = und.map(_._1).distinct
      var label = nodes.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        label = nodes.map { n =>
          val votes = und.filter(_._2 == n)
            .groupBy(e => label(e._1))
            .map { case (l, es) => l -> es.map(_._3).sum }
          n -> votes.toSeq.minBy { case (l, wv) => (-wv, l) }._1
        }.toMap
      }
      label
    }
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 8 + trial * 3
      val pairs = (1 to n * 2).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong, 1L + rng.nextInt(4).toLong)
      }.filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2))
        .map { case ((a, b), es) => (a, b, es.map(_._3).sum) }.toSeq
      val got = LabelProp.run(pairs.toDF("a", "b", "w"), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == serial(pairs, 3), s"trial $trial diverged")
    }
  }

  test("round plan: edge side exchange-free, labels never broadcast") {
    val pairs = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 1L)).toDF("a", "b", "w")
    val edges = LabelProp.prepare(pairs)
    try {
      val l0 = edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")).localCheckpoint()
      val live = TestSpark.livePlan(
        LabelProp.round(edges, l0).queryExecution.executedPlan.toString)
      assert(!live.contains("InMemoryRelation"), s"subtree strip failed:\n$live")
      assert(!live.contains("BroadcastExchange"),
        s"label table must never broadcast:\n$live")
      assert(!live.contains("Exchange hashpartitioning(src"),
        s"edge table must reuse its persisted src-partitioning:\n$live")
      // what moves per round: labels into the join, the two vote
      // aggregations — all label/vote-sized, never edge-sized
      val exchanges = "Exchange hashpartitioning".r.findAllIn(live).length
      assert(exchanges <= 3, s"expected at most 3 narrow exchanges:\n$live")
    } finally edges.unpersist()
  }
}
