package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.llm.{IvfPqIndex, KMeans, PqOps}

/** Persisted IVF-PQ index (the FAISS IVFPQ layout): the probe must be a
  * statically partition-pruned scan of the COMPRESSED code table — the
  * scan cost at scale is corpus · nprobe/centroids ÷ 16 (4 byte codes vs
  * 64 float32s). Both halves of that product are asserted: partition
  * pruning on the physical plan, and ADC scores identical to the inline
  * (unpersisted) PqOps composition over the same probed lists. */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("probe prunes to nprobe code partitions and matches inline ADC") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = KMeans.train(e, 16, 2)
    val books = PqOps.trainCodebooks(e, 4, 16, 16, 2)
    IvfPqIndex.build(e, cents, books, 4, 16, path)

    // the code table covers the whole corpus: M rows per vector, spread
    // over the coarse-quantizer's inverted lists
    val index = spark.read.parquet(path)
    assert(index.count() == e.count() * 4, "M code rows per vector")
    val listDirs = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("cent_id=")).length
    assert(listDirs > 2, s"need >2 lists for pruning to be observable, got $listDirs")

    val q = e.filter(col("vec_id") === 0L)
    val probe = IvfPqIndex.probe(spark, path, cents, books, q, 2, 4, 16)
    val rows = probe.collect()

    // 1) semantics: only vectors from 2 inverted lists are scored
    assert(rows.map(_.getLong(1)).distinct.length == 2)

    // 2) plan: the code-table scan carries a static partition filter on
    //    cent_id and reads 2 of the list directories
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansOf(qs.plan)
      }.flatten
    val scans = scansOf(probe.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths
        .exists(_.toString.contains(path.stripPrefix("/"))))
    assert(scans.nonEmpty, "expected file scans over the persisted code table")
    scans.foreach { scan =>
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "cent_id")),
        s"expected a static partition filter on cent_id, got ${scan.partitionFilters}")
      scan.metrics.get("numPartitions").foreach { m =>
        assert(m.value == 2, s"expected 2 partitions read, got ${m.value}")
      }
    }

    // 3) correctness: ADC scores identical (fixed-point — exact) to the
    //    inline composition restricted to the probed lists
    val probedCents = rows.map(_.getLong(1)).distinct
    val memberIds = index.filter(col("cent_id").isin(probedCents: _*))
      .select("vec_id").distinct()
    val codes = PqOps.encode(e, books, 4, 16)
      .join(memberIds, Seq("vec_id"))
    val expect = PqOps.adcScores(codes, books, q, 4, 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.length - 1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(expect(r.getLong(0)) == r.getDouble(2),
        s"ADC mismatch for vec ${r.getLong(0)}")
    }
  }
}
