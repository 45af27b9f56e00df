package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.ClusterOps

/** Connected-components cluster assignment (the pair-list → keep-one-per-
  * cluster step of a dedup pipeline). */
class ClusterOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain, triangle, and singleton components resolve to min-id labels") {
    // components: {1,2,3,4} (chain needing >1 propagation round),
    // {10,11,12} (triangle), {20,21} (pair); docs 30,31 are edge-free.
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val docs = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L, 31L))
      .toDF("doc_id")
    val out = ClusterOps.assignClusters(docs, edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(d => out(d)._1 == 1L))
    assert(Seq(10L, 11L, 12L).forall(d => out(d)._1 == 10L))
    assert(Seq(20L, 21L).forall(d => out(d)._1 == 20L))
    assert(out(30L) == (30L, true) && out(31L) == (31L, true))
    // exactly one representative per cluster
    val reps = out.collect { case (d, (c, true)) => (d, c) }
    assert(reps.toSet == Set((1L, 1L), (10L, 10L), (20L, 20L), (30L, 30L), (31L, 31L)))
  }

  test("empty edge set: every doc is its own singleton cluster") {
    val docs = Seq(5L, 6L).toDF("doc_id")
    val edges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = ClusterOps.assignClusters(docs, edges).collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(1) && r.getBoolean(2)))
  }

  test("star contraction matches min-label on mixed components") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L).toDF("doc_id")
    val a = ClusterOps.assignClusters(docs, edges, useStarContraction = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val b = ClusterOps.assignClusters(docs, edges, useStarContraction = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(a == b)
  }

  test("star contraction resolves a deep chain in O(log d) rounds") {
    // a 256-vertex path: diameter 255, min-label would need 255 rounds
    // (it caps at maxIter=50 and aborts); two-phase star contraction
    // must label all vertices with the minimum in logarithmically few.
    val n = 256
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val (labels, rounds) = ClusterOps.connectedComponentsStarWithRounds(edges)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == n && out.values.forall(_ == 1L))
    assert(rounds <= 12, s"expected O(log d) rounds for diameter ${n - 1}, got $rounds")
  }

  test("star contraction == min-label on the real minhash-LSH pair graph") {
    // toy graphs above pin the algebra; this pins the two algorithms on
    // an actual near-dup candidate graph (dense multi-band collisions)
    val dir = "/root/testdata/sf0.001"
    val edges = graft.queries.LlmQueries.queries("q_dedup_minhash")(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val a = ClusterOps.assignClusters(docs, edges, useStarContraction = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val b = ClusterOps.assignClusters(docs, edges, useStarContraction = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(a.nonEmpty && a == b)
  }

  test("keep-best election: one keep per cluster, maximal quality, lowest-id tiebreak") {
    val rows = graft.queries.LlmQueries
      .queries("q_dedup_keep_best")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.exists(_._2.length > 1), "need at least one real cluster")
    byCluster.foreach { case (c, members) =>
      val keeps = members.filter(_._4)
      assert(keeps.length == 1, s"cluster $c must keep exactly one doc")
      val best = members.minBy(m => (-m._3, m._1)) // max quality, then min id
      assert(keeps.head._1 == best._1,
        s"cluster $c kept ${keeps.head._1}, expected ${best._1}")
    }
  }

  test("min-label round join reuses the persisted edge partitioning: no exchange") {
    // One propagation round, exactly as connectedComponents builds it:
    // edges hash-partitioned on src and persisted, labels arriving
    // partitioned on id (the previous round's groupBy output). Both sides
    // satisfy the join's required distribution, so the round plan has NO
    // shuffle at all on the (dominant) edge side — that is the property
    // that makes d rounds affordable on a 10⁹-edge graph.
    val spark2 = TestSpark.spark
    val prevBroadcast = spark2.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // no broadcast shortcut
    try {
      val parts = spark2.conf.get("spark.sql.shuffle.partitions").toInt
      val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (20L, 21L)).toDF("doc_a", "doc_b")
      val und = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .repartition(parts, col("src")).persist()
      und.count()
      val labels = und.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
      val round = und.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val plan = round.queryExecution.executedPlan.toString
      // the cached relation's own build plan (inside InMemoryRelation)
      // legitimately shows its one-time REPARTITION_BY_NUM exchange; a
      // per-round shuffle would surface as an EnsureRequirements-inserted
      // exchange on the join inputs.
      assert(!plan.contains("ENSURE_REQUIREMENTS"),
        s"round join should reuse the persisted src-partitioning, got:\n$plan")
      assert(plan.contains("InMemoryTableScan"),
        "round join must read the persisted edge table")
      und.unpersist()
    } finally {
      spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }
}
