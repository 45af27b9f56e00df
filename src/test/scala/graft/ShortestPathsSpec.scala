package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ShortestPaths

/** Bellman-Ford shortest paths: hop-bounded semantics, multi-hop routing,
  * fixpoint behavior, and the bucketed round plan (edge side
  * exchange-free, distance table never broadcast). */
class ShortestPathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dists(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph: k rounds reach exactly k hops; round count is the contract") {
    // 0 →1→ 1 →1→ 2 →1→ 3 →1→ 4 →1→ 5
    val chain = (0L to 4L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "c")
    assert(dists(ShortestPaths.run(chain, 0L, rounds = 5)) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
    // one round short: the chain tail is not yet reached
    assert(!dists(ShortestPaths.run(chain, 0L, rounds = 4)).contains(5L))
  }

  test("multi-hop route beats the direct edge") {
    // direct 0→2 costs 10; 0→1→2 costs 4. One extra round past the
    // 2-hop depth confirms the fixpoint (no further improvement).
    val g = Seq((0L, 2L, 10L), (0L, 1L, 2L), (1L, 2L, 2L)).toDF("src", "dst", "c")
    val expect = Map(0L -> 0L, 1L -> 2L, 2L -> 4L)
    assert(dists(ShortestPaths.run(g, 0L, rounds = 2)) == expect)
    assert(dists(ShortestPaths.run(g, 0L, rounds = 3)) == expect)
  }

  test("random graphs match a serial Bellman-Ford exactly") {
    def serial(edges: Seq[(Long, Long, Long)], src: Long, rounds: Int): Map[Long, Long] = {
      var d = Map(src -> 0L)
      for (_ <- 1 to rounds) {
        val relaxed = edges.flatMap { case (s, t, c) => d.get(s).map(ds => t -> (ds + c)) }
        d = (d.toSeq ++ relaxed).groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).min }
      }
      d
    }
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 6 + trial * 3
      val edges = (1 to n * 3).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong, 1L + rng.nextInt(9).toLong)
      }.filter(e => e._1 != e._2).distinct
      val got = dists(ShortestPaths.run(edges.toDF("src", "dst", "c"), 0L, rounds = 4))
      assert(got == serial(edges, 0L, 4), s"trial $trial diverged")
    }
  }

  test("round plan: edge side exchange-free, distance table never broadcast") {
    val edgesIn = Seq((0L, 1L, 3L), (1L, 2L, 1L), (0L, 2L, 9L), (2L, 3L, 2L))
      .toDF("src", "dst", "c")
    val edges = ShortestPaths.prepare(edgesIn)
    try {
      val d0 = spark.range(1).select(lit(0L).as("node"), lit(0L).as("d")).localCheckpoint()
      val round = ShortestPaths.round(edges, d0)
      val live = TestSpark.livePlan(round.queryExecution.executedPlan.toString)
      assert(!live.contains("BroadcastExchange"),
        s"distance table must never broadcast, got:\n$live")
      assert(!live.contains("Exchange hashpartitioning(src"),
        s"edge table must reuse its persisted src-partitioning, got:\n$live")
      assert(live.contains("ShuffledHashJoin") && live.contains("InMemoryTableScan"),
        s"relax join must read the persisted edges hash-to-hash:\n$live")
    } finally { edges.unpersist(); () }
  }
}
