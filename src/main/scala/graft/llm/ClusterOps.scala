package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Near-duplicate cluster assignment: the step that turns a pair list
  * (from any of the LSH candidate generators) into "keep one document per
  * cluster" — the final operation of a production dedup pipeline.
  *
  * Two algorithms, both labeling every component by its minimum member id
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14):
  *
  *  - [[connectedComponents]] — iterative min-label propagation. Rounds =
  *    graph diameter; each round shuffles ONLY the label table: the
  *    undirected edge list is hash-partitioned on `src` once and
  *    persisted, so every round's edges⋈labels join reuses that
  *    partitioning exchange-free on the edge side (at cluster scale the
  *    equivalent is writing the edge table bucketed by `src`). Right for
  *    near-dup graphs, which are dense and shallow.
  *  - [[connectedComponentsStar]] — alternating large-star/small-star
  *    contraction, the paper's two-phase algorithm. Converges in
  *    O(log d) rounds on chain-shaped components where min-label needs
  *    d rounds, at the cost of rewriting (and re-shuffling) the
  *    shrinking edge list each round. Right when components may be deep.
  *
  * `localCheckpoint` per round truncates the growing lineage — without it
  * the plan doubles every iteration.
  */
object ClusterOps {

  /** Component label per vertex of the undirected edge list `edges`
    * (columns `doc_a`, `doc_b`): returns (doc_id, cluster_id) for every
    * vertex that appears in an edge; cluster_id = min doc_id reachable. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Hash-partition the (static) edge list on the join key ONCE and keep
    // it materialized: every round's join then satisfies its required
    // distribution from the persisted partitioning — the per-round plans
    // exchange only the (small, shrinking-entropy) label table. On a real
    // cluster this DataFrame is a parquet table bucketed by src with the
    // same bucket count as the round partitioning.
    val und = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // LAZY local checkpoints throughout the loop: the convergence
    // aggregate that follows each round is the materializing action, so
    // every round costs ONE job instead of a checkpoint job + an
    // aggregate job (truncation is identical — the checkpoint finalizes
    // when that first action completes)
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
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
        .localCheckpoint(false) // materialized by labelSum below
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    und.unpersist()
    // partially-propagated labels would silently split one true component
    // into several "clusters" (a dedup keeps duplicates) — fail loudly
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(component diameter exceeds maxIter — raise it, or use " +
        "connectedComponentsStar for chain-shaped graphs)")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** One large-star round: every node connects its strictly-larger
    * neighbors to the minimum of its closed neighborhood. Output edges are
    * oriented larger→smaller and deduplicated. */
  private def largeStar(e: DataFrame): DataFrame = {
    val und = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = und.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    // center u, neighbor v > u, attach v to m = min(Γ(u) ∪ {u}) ≤ u < v
    und.join(m, "u").filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** One small-star round over a larger→smaller oriented edge list: every
    * node connects its smaller neighbors (and itself) to their minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy(col("u")).agg(min(col("v")).as("m")) // m < u
    val moved = e.join(m, "u").filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v")) // v > m: both were < u, m is min
    moved.union(m.select(col("u"), col("m").as("v"))).distinct()
  }

  /** Connected components by alternating large-star/small-star
    * contraction. Same output contract as [[connectedComponents]];
    * converges in O(log d) rounds (chains included), so it has no
    * diameter assumption. Returns (labels, rounds). */
  def connectedComponentsStarWithRounds(edges: DataFrame,
                                        maxIter: Int = 30): (DataFrame, Int) = {
    // canonical larger→smaller orientation, self-loops dropped
    var e = edges.select(
      greatest(col("doc_a"), col("doc_b")).as("u"),
      least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false) // materialized by the count below
    // star partition test: no vertex is both a spoke (u) and a center (v).
    // A star partition is a fixpoint of both phases, and only then do the
    // edges read directly as (member, component-min) labels.
    def isStar(df: DataFrame): Boolean =
      df.as("a").join(df.as("b"), col("a.v") === col("b.u"), "left_semi").isEmpty
    var prevCount = e.count()
    var iter = 0
    var converged = prevCount == 0L
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextCount = next.count() // materializes the round
      // fixpoint: equal counts + empty difference over distinct sets ⇒
      // set equality; the star check guards against declaring victory on
      // a non-star fixpoint of the composed round.
      converged = nextCount == prevCount && next.exceptAll(e).isEmpty && isStar(next)
      prevCount = nextCount
      e = next
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIter rounds")
    // fixpoint = disjoint stars centered at component minima: each edge
    // (u, root) IS the final label row; roots label themselves via the
    // caller's coalesce (assignClusters) or the explicit union here.
    val nonRoots = e.select(col("u").as("doc_id"), col("v").as("cluster_id"))
    val roots = e.select(col("v").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
    (nonRoots.union(roots), iter)
  }

  /** See [[connectedComponentsStarWithRounds]]. */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 30): DataFrame =
    connectedComponentsStarWithRounds(edges, maxIter)._1

  /** Cluster assignment for EVERY document: vertices not touched by any
    * edge are their own singleton cluster. `is_rep` marks the one row per
    * cluster a dedup would keep (the minimum doc_id). Near-dup graphs are
    * dense/shallow, so the diameter-bounded min-label algorithm with its
    * exchange-free edge side is the default production path. */
  def assignClusters(docs: DataFrame, edges: DataFrame,
                     useStarContraction: Boolean = false): DataFrame = {
    val comp = if (useStarContraction) connectedComponentsStar(edges)
               else connectedComponents(edges)
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_rep", col("cluster_id") === col("doc_id"))
  }
}
