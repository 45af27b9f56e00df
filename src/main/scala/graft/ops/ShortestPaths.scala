package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Single-source shortest paths by synchronized Bellman-Ford relaxation
  * rounds, integer-exact, in the bucketed shape shared with
  * [[PageRank]] / [[graft.llm.ClusterOps]].
  *
  * Every distance is exact long arithmetic (edge costs are caller-supplied
  * integers), so a fixed round count yields bit-identical results across
  * engines — the DuckDB oracle replays the same rounds unrolled. The round
  * count is part of the operator contract (like LabelProp's): Bellman-Ford
  * needs one round per hop of the longest optimal path, and `rounds` ≥
  * that is a fixpoint, which ShortestPathsSpec pins on a chain graph.
  *
  * Scale design — the per-round plan moves ONLY distance-sized rows:
  *  - the edge table is hash-partitioned on `src` once and persisted, so
  *    each round's edges ⋈ dist join is exchange-free on the (dominant)
  *    edge side and the distance table is NEVER broadcast — executor
  *    memory per round stays O(nodes/partitions) at any node count;
  *  - the relax-regroup `groupBy(node).min(d)` is the one unavoidable
  *    shuffle, map-side partial-min'd;
  *  - the frontier STARTS as one row and grows with reachability, so
  *    early rounds move almost nothing (unlike PageRank, whose rank
  *    table is all nodes from round 0).
  * `shuffle_hash` forbids the size-based broadcast shortcut that would
  * not exist at 10⁹ nodes; `localCheckpoint` per round truncates lineage.
  */
object ShortestPaths {

  /** One relaxation round; pure plan, no checkpoint — exposed so the spec
    * can assert its physical shape. `edges` must be partitioned as
    * produced by [[prepare]]; `dist` is (node, d). */
  def round(edges: DataFrame, dist: DataFrame): DataFrame = {
    val relaxed = edges.join(dist.hint("shuffle_hash"), col("src") === col("node"))
      .select(col("dst").as("node"), (col("d") + col("c")).as("d"))
    dist.union(relaxed)
      .groupBy(col("node")).agg(min(col("d")).as("d"))
  }

  /** Hash-partition the stationary edge table onto the round
    * partitioning; caller unpersists (run does). */
  def prepare(edgesIn: DataFrame): DataFrame = {
    val parts = edgesIn.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val edges = edgesIn.select(col("src"), col("dst"), col("c"))
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize now: an unmaterialized AQE-cached plan reports unknown
    // output partitioning and every round would re-exchange the edges.
    edges.count()
    edges
  }

  /** One multi-source relaxation round: [[round]] with distances keyed
    * (lm, node) — one BFS/Bellman-Ford frontier per landmark `lm`, all
    * sharing the single src-partitioned edge table. The landmark id is
    * carried as a key column through the same two-shuffle plan, so k
    * landmarks cost k× the frontier ROWS, never k passes over the
    * edges. */
  def roundMulti(edges: DataFrame, dist: DataFrame): DataFrame = {
    val relaxed = edges.join(dist.hint("shuffle_hash"), col("src") === col("node"))
      .select(col("lm"), col("dst").as("node"), (col("d") + col("c")).as("d"))
    dist.select(col("lm"), col("node"), col("d")).union(relaxed)
      .groupBy(col("lm"), col("node")).agg(min(col("d")).as("d"))
  }

  /** `rounds` synchronized rounds from EVERY row of `sources(lm, node)` —
    * the landmark-sampled distance table centrality estimators consume
    * (exact when sources = all nodes, as the 25-node demo graph affords;
    * at 10⁹ nodes the caller samples k landmarks and the cost model is
    * unchanged). Returns (lm, node, d): cheapest ≤`rounds`-hop cost from
    * each landmark's start vertex. */
  def runMulti(edgesIn: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    val edges = prepare(edgesIn)
    var dist = sources.select(col("lm"), col("node"), lit(0L).as("d"))
      .localCheckpoint()
    for (_ <- 1 to rounds)
      dist = roundMulti(edges, dist).localCheckpoint()
    edges.unpersist()
    dist
  }

  /** One level of multi-source UNIT-cost BFS carrying shortest-path
    * COUNTS (σ): `dist` holds finalized rows (lm, node, d, sigma) for
    * every node within k−1 hops; the round expands the d = k−1 frontier
    * one hop, drops nodes already finalized (a closer path exists —
    * left_anti on the key), and SUMS predecessor σ per new node: with
    * unit costs a node's level never improves after first touch, so σ
    * finalizes with d and no double counting can occur (the Brandes
    * forward pass, level-synchronous). All-integer, so a fixed round
    * count is bit-exact cross-engine. Frontier/dist stay key-sized
    * rows; the edge side reuses [[prepare]]'s partitioning. */
  def bfsSigmaRound(edges: DataFrame, dist: DataFrame, k: Int): DataFrame = {
    val frontier = dist.filter(col("d") === (k - 1).toLong)
    val relaxed = edges.join(frontier.hint("shuffle_hash"), col("src") === col("node"))
      .select(col("lm"), col("dst").as("node"), col("sigma"))
    val fresh = relaxed
      .join(dist.select(col("lm"), col("node")).hint("shuffle_hash"),
        Seq("lm", "node"), "left_anti")
      .groupBy(col("lm"), col("node")).agg(sum(col("sigma")).as("sigma"))
      .select(col("lm"), col("node"), lit(k.toLong).as("d"), col("sigma"))
    dist.select(col("lm"), col("node"), col("d"), col("sigma")).union(fresh)
  }

  /** `rounds` levels of σ-carrying BFS from every `sources(lm, node)`
    * row over UNIT-cost `edgesIn(src, dst)`; returns (lm, node, d,
    * sigma) — hop distance and the exact number of distinct shortest
    * paths, for every node within `rounds` hops of its landmark. The
    * geodesic-counting table centrality estimators consume: stress /
    * betweenness numerators are σ products joined on this table. */
  def runSigma(edgesIn: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    val edges = prepare(edgesIn.select(col("src"), col("dst"), lit(1L).as("c")))
    // distinct: a duplicated (lm, node) source row would seed sigma = 2
    // and silently double every descendant's path count (runMulti's
    // groupBy-min absorbs duplicates; the sigma union must not)
    var dist = sources.select(col("lm"), col("node")).distinct()
      .select(col("lm"), col("node"), lit(0L).as("d"),
        lit(1L).as("sigma")).localCheckpoint()
    for (k <- 1 to rounds)
      dist = bfsSigmaRound(edges, dist, k).localCheckpoint()
    edges.unpersist()
    dist
  }

  /** Backward path-count accumulation over a [[runSigma]] geodesic table
    * — the Brandes BACKWARD phase in its integer path-COUNT (stress)
    * form. For each (lm, node): h = the number of shortest paths from
    * `node` to all of its strict descendants in lm's BFS DAG,
    * level-synchronous from the deepest level up:
    *
    *   h(v) = Σ over edges (v,w) with d(w) = d(v)+1 of (1 + h(w))
    *
    * σ(s,v)·h(s,v) = Σ_t σ(s,t|v) — the shortest s→t paths routed
    * through v — so summing it over SAMPLED landmarks estimates stress
    * centrality for EVERY node with only k sources: the scale posture
    * the exact triple-join form (q_stress) cannot sample, because its
    * σ(v,t) lookup needs every v as a landmark. With sources = all
    * nodes the estimate is exact and equals the triple join
    * (ShortestPathsSpec pins this). Unit-cost BFS bounds |d(u)−d(v)| ≤ 1
    * across any edge, so each level's contributions come only from the
    * level below and a fixed unroll is bit-exact cross-engine. The edge
    * table is re-partitioned ONCE on dst (the backward join key) and
    * each round moves only frontier-level rows — the [[runSigma]] cost
    * model, reversed. */
  def backwardPathCounts(edgesIn: DataFrame, g: DataFrame, maxLevel: Int): DataFrame = {
    val parts = g.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val edges = edgesIn.select(col("src"), col("dst"))
      .repartition(parts, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count() // materialize: unmaterialized AQE cache loses partitioning
    var h = g.select(col("lm"), col("node"), col("d"), col("sigma"),
      lit(0L).as("h")).localCheckpoint()
    for (l <- maxLevel - 1 to 0 by -1) {
      // hint on the FRONTIER slice (the build side must be the
      // level-sized table, never an edge partition), edges exchange-free
      // on their persisted dst-partitioning — runSigma's round, reversed
      val contrib = edges
        .join(h.filter(col("d") === (l + 1).toLong)
          .select(col("lm"), col("node"), col("h")).hint("shuffle_hash"),
          col("dst") === col("node"))
        .select(col("lm"), col("src").as("cnode"), (col("h") + lit(1L)).as("hw"))
        .groupBy(col("lm"), col("cnode")).agg(sum(col("hw")).as("hv"))
        .withColumnRenamed("cnode", "node")
      h = h.join(contrib, Seq("lm", "node"), "left")
        .select(col("lm"), col("node"), col("d"), col("sigma"),
          when(col("d") === l.toLong && col("hv").isNotNull, col("hv"))
            .otherwise(col("h")).as("h"))
        .localCheckpoint()
    }
    edges.unpersist()
    h
  }

  /** `rounds` synchronized Bellman-Ford rounds over `edgesIn(src, dst, c)`
    * from `source`; returns (node, d) for every node reached within
    * `rounds` hops, d = exact cheapest cost over ≤rounds-hop paths. */
  def run(edgesIn: DataFrame, source: Long, rounds: Int): DataFrame = {
    val spark = edgesIn.sparkSession
    val edges = prepare(edgesIn)
    var dist = spark.range(1)
      .select(lit(source).as("node"), lit(0L).as("d"))
      .localCheckpoint()
    for (_ <- 1 to rounds)
      dist = round(edges, dist).localCheckpoint()
    edges.unpersist()
    dist
  }
}
