package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.llm.IvfIndex

/** Persisted IVF index: the probe must be a statically partition-pruned
  * scan — only the nprobe inverted lists are read, never the full index.
  * That property IS the operator (query cost O(corpus/n_centroids·nprobe)),
  * so it's asserted on the physical plan, not just the result. */
class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("probe prunes to exactly nprobe partitions and matches brute force over them") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    IvfIndex.build(e, cents, path)

    // the index covers the whole corpus, spread over 16 inverted lists
    val index = spark.read.parquet(path)
    assert(index.count() == e.count(), "every vector lands in exactly one list")
    val listDirs = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("cent_id=")).length
    assert(listDirs > 2, s"need >2 lists for pruning to be observable, got $listDirs")

    val probe = IvfIndex.probe(spark, path, cents, e.filter(col("vec_id") === 0L), 2)
    val rows = probe.collect()

    // 1) semantics: only vectors from 2 inverted lists are scored
    assert(rows.map(_.getLong(1)).distinct.length == 2)

    // 2) plan: the scan carries a partition filter on cent_id and its
    //    "partitions read" metric shows 2 of the 16 list directories
    // AQE wraps each materialized stage in a leaf QueryStageExec — descend
    // into stages to reach the actual scans
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansOf(q.plan)
      }.flatten
    val finalPlan = probe.queryExecution.executedPlan
    val scans = scansOf(finalPlan).filter(_.relation.location.rootPaths
      .exists(_.toString.contains(path.stripPrefix("/"))))
    assert(scans.nonEmpty,
      s"expected a file scan over the persisted index in:\n$finalPlan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cent_id")),
      s"expected a static partition filter on cent_id, got ${scan.partitionFilters}")
    scan.metrics.get("numPartitions").foreach { m =>
      assert(m.value == 2, s"expected 2 partitions read, got ${m.value}")
    }

    // 3) correctness: identical to brute-force cosine over the probed lists
    graft.functions.NativeFunctions.register(spark)
    val cos = graft.functions.NativeFunctions.cosineSim _
    val probedCents = rows.map(_.getLong(1)).distinct
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val expect = index.filter(col("cent_id").isin(probedCents: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), cos(col("embedding"), col("qvec")).as("cos_sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(expect(r.getLong(0)) - r.getDouble(2)) < 1e-12)
    }
  }

  test("trained k-means quantizer: recall@10 vs brute force, and better partitioning") {
    graft.functions.NativeFunctions.register(spark)
    val cos = graft.functions.NativeFunctions.cosineSim _
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))

    def top10(cents: org.apache.spark.sql.DataFrame): Set[Long] = {
      val path = java.nio.file.Files.createTempDirectory("graft_ivf_recall").toString
      IvfIndex.build(e, cents, path)
      IvfIndex.probe(spark, path, cents, e.filter(col("vec_id") === 0L), 4)
        .filter(col("vec_id") =!= 0L)
        .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    }
    val exact = e.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q))
      .select(col("vec_id"), cos(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet

    val trained = graft.llm.KMeans.train(e, 16, 2)
    val recallTrained = (top10(trained) & exact).size
    // nprobe=4 of 16 lists reads ~25% of the corpus; the trained
    // quantizer must keep most true neighbors inside the probed lists
    // (this corpus measures 9/10; a floor of 7 leaves noise margin —
    // untrained first-16 centroids happen to measure similarly here
    // because uniform random embeddings have no cluster structure for
    // k-means to exploit, so no trained-vs-untrained assertion).
    assert(recallTrained >= 7, s"recall@10 with trained centroids = $recallTrained/10")
  }

  test("kmeans|| quantizer: partial-probe recall@10 and pruned persisted probe") {
    // The production init path (trainParallel: kmeans|| oversampling +
    // Lloyd) through the persisted index: the registry query
    // q_ann_ivf_kmpp pins the full-probe==bruteforce invariant; THIS is
    // where partial-probe recall through that init is held.
    graft.functions.NativeFunctions.register(spark)
    val cos = graft.functions.NativeFunctions.cosineSim _
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val exact = e.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q))
      .select(col("vec_id"), cos(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val cents = graft.llm.KMeans.trainParallel(e, 16, 2, 8, 3)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_kmpp").toString
    IvfIndex.build(e, cents, path)
    val got = IvfIndex.probe(spark, path, cents, e.filter(col("vec_id") === 0L), 6)
      .filter(col("vec_id") =!= 0L)
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
      .collect()
    // nprobe=6 of 16 ⇒ ~38% of the corpus read; deterministic init (md5
    // coins) ⇒ a fixed recall on this corpus. These embeddings are
    // uniform random — no cluster structure for ANY quantizer to exploit
    // — so partial-probe recall tracks the probed fraction plus the
    // query-proximity bias (measures 8/10 here; 4 lists measured 6/10;
    // floor 7 leaves noise margin).
    val recall = (got.map(_.getLong(0)).toSet & exact).size
    assert(recall >= 7, s"recall@10 through kmeans|| init = $recall/10")
    assert(got.map(_.getLong(1)).distinct.length <= 6, "results come from ≤ nprobe lists")
  }

  test("incremental append: probes see new vectors, index equals a full rebuild") {
    graft.functions.NativeFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val incr = java.nio.file.Files.createTempDirectory("graft_ivf_incr").toString
    val full = java.nio.file.Files.createTempDirectory("graft_ivf_full").toString
    // day 1: even vectors; day 2: the odd batch appends in place
    IvfIndex.build(e.filter(col("vec_id") % 2 === 0), cents, incr)
    val before = IvfIndex.probe(spark, incr, cents, e.filter(col("vec_id") === 0L), 3)
      .count()
    IvfIndex.append(e.filter(col("vec_id") % 2 =!= 0), cents, incr)
    IvfIndex.build(e, cents, full)
    def probed(path: String) =
      IvfIndex.probe(spark, path, cents, e.filter(col("vec_id") === 0L), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = probed(incr); val b = probed(full)
    assert(a == b, "appended index must probe identically to a full rebuild")
    assert(a.size > before, "the probe must see the appended vectors")
    // append touched no existing list files, only added new ones
    assert(spark.read.parquet(incr).count() == e.count())
  }

  test("config-driven ANN geometry: non-default knobs produce a valid probed top-k") {
    val cfg = graft.util.PipelineConfig.parse(Seq(
      "ann:", "  ivf_centroids: 8", "  ivf_nprobe: 3", "  lloyd_rounds: 1"))
    val out = graft.queries.LlmQueries.annIvfFromConfig(spark, dir, cfg).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).distinct.length <= 3, "results come from ≤ nprobe lists")
  }
}
