package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Integer-exact weighted PageRank over an edge table, in the
  * bucketed-rank shape that survives graphs too large to broadcast.
  *
  * Ranks live in integer MICRO-UNITS with floor-division updates — every
  * step is exact long arithmetic, so results are bit-identical across
  * engines (a float PageRank would drift with summation order).
  *
  * Scale design (the ClusterOps pattern, Kiveris et al. SoCC'14 §3):
  * the edge table — with per-source out-weights pre-joined once — is
  * hash-partitioned on `src` and persisted; the node table likewise on
  * `node`. Per round the plan then moves ONLY rank-sized rows:
  *
  *  - edges ⋈ ranks on src: the dominant edge side satisfies the
  *    required distribution from the persisted partitioning — zero
  *    exchange — and the rank vector is NEVER broadcast (executor
  *    memory per round is O(nodes/partitions), not the O(nodes) a
  *    broadcast would need). The rank table re-buckets into the join
  *    (one narrow-row shuffle; `localCheckpoint` does not carry
  *    partitioning through an adaptive plan in this Spark build);
  *  - inflow groupBy(dst): the one unavoidable regroup from source to
  *    destination, map-side partial-summed;
  *  - nodes ⟕ inflow on node: both sides already hashpartitioning(node)
  *    — zero exchange.
  *
  * `shuffle_hash` hints pin the co-partitioned joins to ShuffledHashJoin:
  * they forbid the size-based broadcast shortcut (which would not exist
  * at 10⁹ nodes and whose per-round driver collect is the scale-killer
  * this shape removes) and skip SortMergeJoin's per-round re-sort of the
  * stationary edge side. On a real cluster the persisted frames are
  * parquet tables bucketed by src/node with the same bucket count.
  * PageRankSpec asserts the round plan: no exchange on the edge side, no
  * BroadcastExchange anywhere. `localCheckpoint` per round truncates the
  * growing lineage.
  */
object PageRank {

  /** Initial rank (and the unit of the damping arithmetic): 1.0 == 1e6. */
  val Micro = 1000000L

  /** One power-iteration round; pure plan, no checkpoint — exposed so the
    * spec can assert its physical shape. Inputs must be partitioned as
    * produced by [[prepare]]. */
  def round(edges: DataFrame, nodes: DataFrame, ranks: DataFrame,
            dampingPct: Long = 85L): DataFrame = {
    val inflow = edges.join(ranks.hint("shuffle_hash"), col("src") === col("node"))
      .select(col("dst").as("node"), expr("rank * w div wout").as("c"))
      .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
    nodes.join(inflow.hint("shuffle_hash"), Seq("node"), "left")
      .select(col("node"),
        (lit((100L - dampingPct) * Micro / 100L) +
          expr(s"$dampingPct * coalesce(inflow, 0) div 100")).as("rank"))
  }

  /** Out-weight the edge list and hash-partition both stationary tables
    * onto the round partitioning; caller unpersists via [[run]]. */
  def prepare(edgesIn: DataFrame): (DataFrame, DataFrame) = {
    val parts = edgesIn.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val outW = edgesIn.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val edges = edgesIn.join(outW, "src")
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edgesIn.select(col("src").as("node"))
      .union(edgesIn.select(col("dst")))
      .distinct()
      .repartition(parts, col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize now: an unmaterialized AQE-cached plan reports unknown
    // output partitioning, which would make every round re-exchange the
    // edge side (the scale property this shape exists for).
    edges.count(); nodes.count()
    (edges, nodes)
  }

  /** Fixed-iteration weighted PageRank over `edgesIn(src, dst, w)`;
    * returns (node, rank) with rank in micro-units. */
  def run(edgesIn: DataFrame, iterations: Int = 5,
          dampingPct: Long = 85L): DataFrame = {
    val (edges, nodes) = prepare(edgesIn)
    // eager checkpoint: materializes each round AND pins the
    // hashpartitioning(node) the next round's joins reuse.
    var ranks = nodes.withColumn("rank", lit(Micro)).localCheckpoint()
    for (_ <- 1 to iterations)
      ranks = round(edges, nodes, ranks, dampingPct).localCheckpoint()
    edges.unpersist()
    nodes.unpersist()
    ranks
  }
}
