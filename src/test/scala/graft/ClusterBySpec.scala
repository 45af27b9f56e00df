package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Incremental clustering (Delta Liquid Clustering analogue):
  * `ALTER TABLE … CLUSTER BY (keys)` registers `gvt.clusterBy`; plain
  * OPTIMIZE then z-order-rewrites ONLY chain members not already
  * clustered on the current keys (each clustering commit stamps
  * `_clustered`), as one DV commit — O(new data since the last
  * OPTIMIZE), idempotent under scheduling, content-identical,
  * CDF-neutral. */
class ClusterBySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def rows(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, ((i * 2654435761L) % 1000), s"s$i"))
      .toDF("k", "j", "s")

  test("CLUSTER BY + plain OPTIMIZE: incremental rewrite, scheduled " +
    "idempotence, O(new data) on appends, content identical") {
    val root = fresh("clust")
    VersionedTable.write(rows(1, 800).repartition(4), root) // v1
    val before = VersionedTable.readLatest(spark, root)
      .orderBy("k").collect().toSeq
    GraftSession.withExtensions(spark) { sess =>
      sess.sql(s"ALTER TABLE gvt.`$root` CLUSTER BY (k, j)")
      assert(VersionedTable.clusterByOf(root) == Seq("k", "j"))
      // first OPTIMIZE clusters the whole (un-clustered) table
      val v2 = sess.sql(s"OPTIMIZE gvt.`$root`").head.getLong(0)
      assert(v2 == 2L)
      assert(VersionedTable.readMeta(root, v2, "_clustered")
        .map(_.trim).contains("k,j"))
      // zone maps on BOTH keys rode the clustering commit
      val statCols = spark.read.parquet(s"$root/v=$v2/_stats")
        .schema.fieldNames.toSet
      assert(statCols("min_k") && statCols("min_j"), statCols.toString)
      // scheduled repeat: everything clustered -> NO new commit
      assert(sess.sql(s"OPTIMIZE gvt.`$root`").head.getLong(0) == v2)
      // new data arrives un-clustered
      VersionedTable.append(rows(801, 1000), root) // v3
      val v4 = sess.sql(s"OPTIMIZE gvt.`$root`").head.getLong(0)
      assert(v4 == 4L)
      // O(new data): the rewrite masked ONLY the append's files — the
      // already-clustered v2 slice was not re-churned
      val dvFiles = spark.read.parquet(s"$root/v=$v4/_dv")
        .select("_dv_file").distinct().collect().map(_.getString(0)).toSeq
      assert(dvFiles.nonEmpty && dvFiles.forall(_.contains("/v=3/")),
        s"incremental cluster must rewrite only the new batch: $dvFiles")
      // content identical through both rewrites
      val after = VersionedTable.readLatest(spark, root)
        .orderBy("k").collect().toSeq
      assert(after == before ++ rows(801, 1000).orderBy("k").collect().toSeq)
      // CDF-neutral (the OPTIMIZE-family contract, keyless)
      assert(VersionedTable.changes(spark, root, v2, 3L).count() == 200)
      assert(VersionedTable.changes(spark, root, 3L, v4).count() == 0)
      // OPTIMIZE FULL re-clusters EVERYTHING on the current keys in
      // one global layout (both prior slices' files masked)
      val v5 = sess.sql(s"OPTIMIZE gvt.`$root` FULL").head.getLong(0)
      assert(v5 == 5L)
      val fullDv = spark.read.parquet(s"$root/v=$v5/_dv")
        .select("_dv_file").distinct().collect().map(_.getString(0)).toSeq
      assert(fullDv.exists(_.contains(s"/v=2/")) &&
        fullDv.exists(_.contains(s"/v=4/")),
        s"FULL must re-cluster every live slice: $fullDv")
      assert(VersionedTable.readLatest(spark, root)
        .orderBy("k").collect().toSeq == after)
      // and a repeat plain OPTIMIZE after FULL is again a no-op
      assert(sess.sql(s"OPTIMIZE gvt.`$root`").head.getLong(0) == v5)
      // CLUSTER BY NONE unregisters; OPTIMIZE returns to its old
      // meaning, and FULL without keys refuses
      sess.sql(s"ALTER TABLE gvt.`$root` CLUSTER BY NONE")
      assert(VersionedTable.clusterByOf(root).isEmpty)
      val e = intercept[Exception] {
        sess.sql(s"OPTIMIZE gvt.`$root` FULL")
      }
      assert(e.getMessage.contains("CLUSTER BY"), e.getMessage)
    }
  }

  test("a single cluster key sorts linearly and enables skipping on it") {
    val root = fresh("clust1")
    // shuffled order so pre-cluster files all span the full range
    VersionedTable.write(rows(1, 1000)
      .orderBy(col("j")).repartition(8), root)
    VersionedTable.setTblProperties(root, Map("gvt.clusterBy" -> "k"))
    val v2 = VersionedTable.clusterIncremental(spark, root,
      targetFileBytes = 16L * 1024)
    assert(v2 == 2L)
    val pruned = VersionedTable.readPruned(spark, root, "k", 10, 60)
    assert(pruned.count() == 51)
    val nScanned = pruned.inputFiles
      .count(f => f.contains(s"/v=$v2/") && !f.contains("/_dv"))
    val nTotal = spark.read.parquet(s"$root/v=$v2/_stats").count()
    assert(nScanned < nTotal,
      s"sorted clustering must let zone maps skip files ($nScanned/$nTotal)")
  }

  test("changing the keys re-clusters; partition-key clustering refuses") {
    val root = fresh("clust2")
    VersionedTable.write(rows(1, 200).withColumn("p", col("k") % 2), root,
      partitionBy = Seq("p"))
    VersionedTable.setTblProperties(root, Map("gvt.clusterBy" -> "k,j"))
    val v2 = VersionedTable.clusterIncremental(spark, root)
    assert(v2 == 2L)
    // same keys: no-op; new keys: the stamp no longer matches -> recluster
    assert(VersionedTable.clusterIncremental(spark, root) == v2)
    VersionedTable.setTblProperties(root, Map("gvt.clusterBy" -> "j,k"))
    assert(VersionedTable.clusterIncremental(spark, root) == 3L)
    VersionedTable.setTblProperties(root, Map("gvt.clusterBy" -> "p,k"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.clusterIncremental(spark, root)
    }
    assert(e.getMessage.contains("partition"))
  }
}
