package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.PageRank

/** Bucketed-rank PageRank: exactness on a hand-checkable graph and the
  * scale property the shape exists for — per-round plans with exactly one
  * exchange (the inflow regroup) and NO broadcast of the rank vector. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-node cycle reaches the uniform fixpoint exactly") {
    // A ⇄ B with equal weights: ranks stay at 1.0 (micro-units) every
    // round — 150000 + 85 * 1000000 div 100 == 1000000 exactly.
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val out = PageRank.run(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> PageRank.Micro, 2L -> PageRank.Micro))
  }

  test("weighted star splits rank along out-weights with floor division") {
    // 1 → 2 (w=3), 1 → 3 (w=1): after round 1,
    //   node 1 inflow 0              → 150000
    //   node 2 inflow 10⁶*3 div 4    → 150000 + 85*750000 div 100 = 787500
    //   node 3 inflow 10⁶*1 div 4    → 150000 + 85*250000 div 100 = 362500
    // (nodes 2 and 3 are sinks: they emit nothing in later rounds, so
    // one round of a 1-iteration run pins the arithmetic.)
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val out = PageRank.run(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 150000L, 2L -> 787500L, 3L -> 362500L))
  }

  private def livePlan(plan: String): String = TestSpark.livePlan(plan)

  test("random graphs match a serial integer reference exactly") {
    // The distributed loop vs a 20-line serial re-derivation of the
    // same integer recurrence: exact long arithmetic on both sides, so
    // equality is bit-exact — any divergence in join/agg plumbing
    // (dropped edges, double-counted inflow, wrong damping order)
    // surfaces as inequality, on graphs with dangling nodes, cycles,
    // multi-edges collapsed to weights, and isolated pairs.
    def serial(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val wout = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
      var rank = nodes.map(_ -> PageRank.Micro).toMap
      for (_ <- 1 to iters) {
        val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((s, d, w) <- edges)
          inflow(d) += Math.floorDiv(rank(s) * w, wout(s))
        rank = nodes.map(n => n -> (150000L + Math.floorDiv(85L * inflow(n), 100L))).toMap
      }
      rank
    }
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 8 + trial * 4
      val edges = (1 to n * 2).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong, 1L + rng.nextInt(3).toLong)
      }.filter(e => e._1 != e._2)
        // collapse parallel edges into summed weights (the registry
        // query's groupBy(src, dst) does the same upstream)
        .groupBy(e => (e._1, e._2))
        .map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSeq
      val df = edges.toDF("src", "dst", "w")
      val got = PageRank.run(df, iterations = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == serial(edges, 4), s"trial $trial diverged from the serial reference")
    }
  }

  test("round plan: edge side exchange-free, rank vector never broadcast") {
    // The properties that distinguish this shape from the broadcast-rank
    // variant, with the default (permissive) autoBroadcastJoinThreshold
    // in force: (a) the persisted edge table feeds its join with NO
    // exchange — per-round shuffled bytes are rank-sized, not edge-sized;
    // (b) no BroadcastExchange anywhere — at 10⁹ nodes the rank table
    // cannot broadcast, so the plan must not rely on it at any scale.
    val edgesIn = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 1L), (1L, 3L, 4L))
      .toDF("src", "dst", "w")
    val (edges, nodes) = PageRank.prepare(edgesIn)
    try {
      val ranks0 = nodes.withColumn("rank", lit(PageRank.Micro)).localCheckpoint()
      val round = PageRank.round(edges, nodes, ranks0)
      val live = livePlan(round.queryExecution.executedPlan.toString)
      assert(!live.contains("InMemoryRelation"), s"subtree strip failed:\n$live")
      assert(!live.contains("BroadcastExchange"),
        s"rank vector must never broadcast, got:\n$live")
      assert(!live.contains("Exchange hashpartitioning(src"),
        s"edge table must reuse its persisted src-partitioning, got:\n$live")
      // what DOES move per round: the rank table into its join, and the
      // inflow regroup — both keyed on node, both rank-sized.
      val exchanges = "Exchange hashpartitioning\\(node".r.findAllIn(live).length
      assert(exchanges == 2,
        s"expected the two rank-sized node exchanges only, got:\n$live")
      assert("ShuffledHashJoin".r.findAllIn(live).length == 2 &&
        "InMemoryTableScan".r.findAllIn(live).length == 2,
        s"both joins must read the persisted tables hash-to-hash:\n$live")
    } finally { edges.unpersist(); nodes.unpersist() }
  }
}
