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

  test("multi-source rounds: per-landmark BFS matches per-source serial runs") {
    // every landmark's distance slice must equal an independent
    // single-source run — the lm key must never leak between frontiers
    val rng = new scala.util.Random(23)
    val n = 9
    val edges = (1 to n * 3).map { _ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong, 1L)
    }.filter(e => e._1 != e._2).distinct
    val df = edges.toDF("src", "dst", "c")
    val srcs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val sources = srcs.map(s => (s, s)).toDF("lm", "node")
    val multi = ShortestPaths.runMulti(df, sources, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (s <- srcs) {
      val single = dists(ShortestPaths.run(df, s, rounds = 4))
      assert(multi.collect { case ((lm, v), d) if lm == s => v -> d }.toMap == single,
        s"landmark $s slice diverged from its single-source run")
    }
  }

  test("multi-source round plan: same bucketed shape, landmark key is free") {
    val edges = ShortestPaths.prepare(
      Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 0L, 1L)).toDF("src", "dst", "c"))
    try {
      val d0 = Seq((0L, 0L, 0L), (1L, 1L, 0L)).toDF("lm", "node", "d")
        .localCheckpoint()
      val round = ShortestPaths.roundMulti(edges, d0)
      val live = TestSpark.livePlan(round.queryExecution.executedPlan.toString)
      assert(!live.contains("BroadcastExchange"),
        s"distance table must never broadcast:\n$live")
      assert(!live.contains("Exchange hashpartitioning(src"),
        s"edge table must reuse its persisted src-partitioning:\n$live")
    } finally { edges.unpersist(); () }
  }

  test("sigma BFS: shortest-path counts match a serial reference on random graphs") {
    def serial(edges: Seq[(Long, Long)], src: Long,
               rounds: Int): Map[Long, (Long, Long)] = {
      var done = Map(src -> (0L, 1L)) // node -> (d, sigma)
      var frontier = Map(src -> 1L)
      for (k <- 1 to rounds) {
        val nxt = edges.flatMap { case (a, b) => frontier.get(a).map(s => b -> s) }
          .filterNot { case (n, _) => done.contains(n) }
          .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).sum }
        done = done ++ nxt.map { case (n, s) => n -> (k.toLong, s) }
        frontier = nxt
      }
      done
    }
    val rng = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val n = 7 + trial * 2
      val edges = (1 to n * 3).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      }.filter(e => e._1 != e._2).distinct
      val sources = Seq((0L, 0L), (1L, 1L)).toDF("lm", "node")
      val got = ShortestPaths.runSigma(edges.toDF("src", "dst"), sources, rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      for (s <- Seq(0L, 1L)) {
        val exp = serial(edges, s, 4)
        val slice = got.collect { case ((lm, v), ds) if lm == s => v -> ds }.toMap
        assert(slice == exp, s"trial $trial lm=$s: sigma BFS diverged from serial")
      }
    }
  }

  test("sigma BFS: diamond graph counts both shortest paths") {
    // 0→{1,2}→3: two 2-hop shortest paths to 3, σ(3) = 2; the direct
    // 3-hop edge chain 0→4→5→3 must NOT contribute (longer)
    val g = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L),
      (0L, 4L), (4L, 5L), (5L, 3L)).toDF("src", "dst")
    val got = ShortestPaths.runSigma(g, Seq((0L, 0L)).toDF("lm", "node"), rounds = 4)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(3L) == (2L, 2L), s"node 3 must finalize at d=2 with sigma=2, got $got")
    assert(got(5L) == (2L, 1L) && got(4L) == (1L, 1L))
  }

  test("backwardPathCounts with all-node landmarks reproduces the triple-join stress") {
    // branched path graph (symmetrized): 0-1-2-3 with a 1-4-5 spur —
    // diameter 4, non-trivial brokered routes through 1, 2, 4
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (1L, 4L), (4L, 5L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val all = e.select(col("src").as("node")).distinct()
      .select(col("node").as("lm"), col("node"))
    val g = ShortestPaths.runSigma(e, all, rounds = 4).localCheckpoint()
    val backward = ShortestPaths.backwardPathCounts(e, g, 4)
      .filter(col("d") > 0)
      .groupBy(col("node")).agg(sum(col("sigma") * col("h")).as("stress"))
      .filter(col("stress") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact form: the 3-way σ-product join of q_stress
    val sv = g.select(col("lm").as("s"), col("node").as("v"),
      col("d").as("d1"), col("sigma").as("s1")).filter(col("d1") > 0)
    val vt = g.select(col("lm").as("v"), col("node").as("t"),
      col("d").as("d2"), col("sigma").as("s2")).filter(col("d2") > 0)
    val st = g.select(col("lm").as("s"), col("node").as("t"),
      col("d").as("d3")).filter(col("d3") > 0)
    val exact = sv.join(vt, Seq("v")).join(st, Seq("s", "t"))
      .filter(col("d1") + col("d2") === col("d3"))
      .groupBy(col("v")).agg(sum(col("s1") * col("s2")).as("stress"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(backward == exact, s"backward=$backward exact=$exact")
    assert(backward.nonEmpty && backward(1L) > backward.getOrElse(3L, 0L),
      "the articulation node must broker more routes than a leaf-adjacent one")
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
