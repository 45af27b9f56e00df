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
