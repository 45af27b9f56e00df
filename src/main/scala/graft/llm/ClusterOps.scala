package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster assignment: the step that turns a pair list
  * (from any of the LSH candidate generators) into "keep one document per
  * cluster" — the final operation of a production dedup pipeline.
  *
  * Connected components by iterative min-label propagation: every vertex
  * starts labeled with its own id; each round, every vertex adopts the
  * minimum label among itself and its neighbors; fixpoint = each component
  * labeled by its minimum member id. Rounds needed = graph diameter
  * (near-dup clusters are dense and shallow, so this is small in
  * practice). Each round is one shuffle-join plus one aggregation — the
  * classic Spark formulation (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14; their star-contraction variants are
  * the upgrade path if 100 TB corpora produce deep chain components).
  * `localCheckpoint` per round truncates the growing lineage — without it
  * the plan doubles every iteration.
  */
object ClusterOps {

  /** Component label per vertex of the undirected edge list `edges`
    * (columns `doc_a`, `doc_b`): returns (doc_id, cluster_id) for every
    * vertex that appears in an edge; cluster_id = min doc_id reachable. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val und = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    // convergence check: labels only ever DECREASE under min-propagation,
    // so the label sum strictly decreases until fixpoint — one cheap
    // aggregate per round instead of a join-and-count against the
    // previous labels (halves the jobs per iteration). decimal(38,0)
    // keeps the sum exact at any corpus size.
    def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty vertex set (no edges)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor labels flow along edges; min over (self ∪ neighbors)
      val msgs = und.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.union(msgs)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    // partially-propagated labels would silently split one true component
    // into several "clusters" (a dedup keeps duplicates) — fail loudly
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(component diameter exceeds maxIter — raise it, or switch to " +
        "star-contraction for chain-shaped graphs)")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Cluster assignment for EVERY document: vertices not touched by any
    * edge are their own singleton cluster. `is_rep` marks the one row per
    * cluster a dedup would keep (the minimum doc_id). */
  def assignClusters(docs: DataFrame, edges: DataFrame): DataFrame = {
    val comp = connectedComponents(edges)
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_rep", col("cluster_id") === col("doc_id"))
  }
}
