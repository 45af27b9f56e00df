package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label propagation (Raghavan et al. 2007) for community
  * detection, in the same bucketed shape as [[PageRank]]: the undirected
  * weighted edge list is hash-partitioned on `src` and persisted ONCE, so
  * every round's edges⋈labels join is exchange-free on the (dominant)
  * edge side and the label table is never broadcast.
  *
  * Each round every node adopts the label with the highest total incident
  * edge weight — ties broken by smallest label, so the iteration is fully
  * deterministic (classic LPA breaks ties randomly; a verified engine
  * cannot). The weighted arg-max is max(struct(weight, -label)) — one
  * hash aggregation, no per-node window — and a FIXED round count keeps
  * the result well-defined under the oscillation synchronous LPA allows
  * on bipartite structures (the DuckDB oracle replays the same rounds).
  */
object LabelProp {

  /** One synchronous round; pure plan (no checkpoint) so the spec can
    * assert its physical shape. `edges` must be partitioned as produced
    * by [[prepare]]. */
  def round(edges: DataFrame, labels: DataFrame): DataFrame = {
    val votes = edges.join(labels.hint("shuffle_hash"), col("src") === col("node"))
      .select(col("dst"), col("label").as("nlabel"), col("w"))
      .groupBy(col("dst"), col("nlabel")).agg(sum(col("w")).as("wv"))
    votes.groupBy(col("dst").as("node"))
      .agg(max(struct(col("wv"), (-col("nlabel")).as("nl"))).as("top"))
      .select(col("node"), (-col("top.nl")).as("label"))
  }

  /** Symmetrize (a, b, w) and hash-partition onto the round partitioning;
    * caller unpersists via [[run]]. */
  def prepare(pairs: DataFrame): DataFrame = {
    val parts = pairs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val in = pairs.toDF("a", "b", "w").filter(col("a") =!= col("b"))
    val und = in.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .union(in.select(col("b").as("src"), col("a").as("dst"), col("w")))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count() // materialize: unmaterialized AQE cache loses partitioning
    und
  }

  /** `iterations` synchronous rounds over undirected `pairs(a, b, w)`;
    * returns (node, label) — label = the elected community id. */
  def run(pairs: DataFrame, iterations: Int = 4): DataFrame = {
    val edges = prepare(pairs)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    for (_ <- 1 to iterations)
      labels = round(edges, labels).localCheckpoint()
    edges.unpersist()
    labels
  }
}
