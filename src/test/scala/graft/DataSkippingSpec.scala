package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ZOrder
import graft.sources.VersionedTable

/** File-level data skipping (zone maps): per-file min/max stats collected
  * at write time prune the file list BEFORE the scan. Asserted directly
  * on `inputFiles` — the planner never sees skipped files — plus result
  * equivalence with the unpruned scan, and the pairing that justifies
  * ops/ZOrder: a z-ordered layout keeps per-file ranges tight on BOTH
  * interleaved keys, so skipping works on the non-leading dimension
  * where a linear sort reads everything. */
class DataSkippingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_skip").toString + "/t"

  test("pruned read scans only intersecting files; results identical") {
    val root = freshRoot()
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // range-partition into 8 files with disjoint o_orderkey ranges
    VersionedTable.write(
      orders.repartitionByRange(8, col("o_orderkey")),
      root, statsCols = Seq("o_orderkey", "o_custkey"))

    val keys = orders.agg(min("o_orderkey"), max("o_orderkey")).head
    val (kLo, kHi) = (keys.getLong(0), keys.getLong(1))
    val lo = kLo + (kHi - kLo) / 3.0
    val hi = kLo + (kHi - kLo) / 2.5
    val pruned = VersionedTable.readPruned(spark, root, "o_orderkey", lo, hi)
    val full = VersionedTable.readLatest(spark, root)
      .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi)

    assert(VersionedTable.readLatest(spark, root).inputFiles.length == 8)
    val scanned = pruned.inputFiles.length
    assert(scanned < 8 && scanned >= 1,
      s"narrow range over disjoint file ranges must skip files, scanned $scanned/8")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
      full.collect().map(_.getLong(0)).sorted.toSeq)
    assert(pruned.count() > 0)
  }

  test("no stats -> full filtered scan; disjoint range -> empty with schema") {
    val root = freshRoot()
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    VersionedTable.write(orders.repartition(4), root) // no statsCols
    val noStats = VersionedTable.readPruned(spark, root, "o_orderkey", 0, 1e12)
    assert(noStats.count() == orders.count())

    val root2 = freshRoot()
    VersionedTable.write(orders.repartition(4), root2, statsCols = Seq("o_orderkey"))
    val none = VersionedTable.readPruned(spark, root2, "o_orderkey", -100, -1)
    assert(none.count() == 0)
    assert(none.columns.toSeq == orders.columns.toSeq)
  }

  test("append-chain skipping: per-batch stats prune across version directories") {
    val root = freshRoot()
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val r = o.agg(min("o_custkey"), max("o_custkey")).head
    val (cLo, cHi) = (r.getLong(0), r.getLong(1))
    val (t1, t2) = (cLo + (cHi - cLo) / 3, cLo + 2 * (cHi - cLo) / 3)
    // day-1 load + two appended batches, each statting only ITS files
    VersionedTable.write(
      o.filter(col("o_custkey") < t1).repartitionByRange(4, col("o_custkey")),
      root, statsCols = Seq("o_custkey"))
    VersionedTable.append(
      o.filter(col("o_custkey") >= t1 && col("o_custkey") < t2)
        .repartitionByRange(4, col("o_custkey")),
      root, statsCols = Seq("o_custkey"))
    VersionedTable.append(
      o.filter(col("o_custkey") >= t2).repartitionByRange(4, col("o_custkey")),
      root, statsCols = Seq("o_custkey"))
    val total = VersionedTable.readLatest(spark, root).inputFiles.length
    assert(total >= 9, s"expected ~12 files across the chain, got $total")
    // a range inside the middle batch: day-1 and day-3 files must skip
    val lo = t1 + (t2 - t1) / 4.0
    val hi = t1 + (t2 - t1) / 2.0
    val pruned = VersionedTable.readPruned(spark, root, "o_custkey", lo, hi)
    assert(pruned.inputFiles.length <= total / 2,
      s"chain pruning must skip other batches' files: ${pruned.inputFiles.length}/$total")
    assert(pruned.count() ==
      o.filter(col("o_custkey") >= lo && col("o_custkey") <= hi).count())
    // a chain member WITHOUT stats is read whole, but the STATTED
    // members keep pruning (partial pruning) — and counts stay right
    VersionedTable.append(o.limit(5), root) // no statsCols
    val partial = VersionedTable.readPruned(spark, root, "o_custkey", lo, hi)
    assert(partial.count() ==
      o.filter(col("o_custkey") >= lo && col("o_custkey") <= hi).count() +
        o.limit(5).filter(col("o_custkey") >= lo && col("o_custkey") <= hi).count())
    val stattedScanned = partial.inputFiles.count(f =>
      Seq("/v=1/", "/v=2/", "/v=3/").exists(f.contains))
    assert(stattedScanned <= total / 2,
      s"statted chain members must still prune: $stattedScanned/$total")
  }

  test("pruning composes with deletion vectors: files skip AND deleted rows drop") {
    val root = freshRoot()
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    VersionedTable.write(orders.repartitionByRange(8, col("o_orderkey")),
      root, statsCols = Seq("o_orderkey"))
    VersionedTable.deleteWhereVector(spark, root, col("o_orderkey") % 2 === 0)
    val keys = orders.agg(min("o_orderkey"), max("o_orderkey")).head
    val (kLo, kHi) = (keys.getLong(0), keys.getLong(1))
    val lo = kLo + (kHi - kLo) / 3.0
    val hi = kLo + (kHi - kLo) / 2.5
    val pruned = VersionedTable.readPruned(spark, root, "o_orderkey", lo, hi)
    // zone maps still prune the statted base files under the DV chain
    val baseScanned = pruned.inputFiles.count(_.contains("/v=1/"))
    assert(baseScanned < 8 && baseScanned >= 1,
      s"DV chain must still prune the base: $baseScanned/8")
    // and the vectors still apply to the surviving files
    assert(pruned.count() == orders.filter(
      col("o_orderkey") >= lo && col("o_orderkey") <= hi &&
        col("o_orderkey") % 2 =!= 0).count())
  }

  test("z-order enables skipping on the second key where linear sort cannot") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val bounds = li.agg(min("l_orderkey").as("amin"), max("l_orderkey").as("amax"),
      min("l_partkey").as("bmin"), max("l_partkey").as("bmax")).head
    val (amin, amax, bmin, bmax) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2), bounds.getLong(3))
    val z = ZOrder.zorder2(
      ZOrder.rangeBucket(col("l_orderkey"), lit(amin), lit(amax), 16),
      ZOrder.rangeBucket(col("l_partkey"), lit(bmin), lit(bmax), 16))

    val zRoot = freshRoot()
    VersionedTable.write(
      li.withColumn("zk", z).repartitionByRange(16, col("zk")).drop("zk"),
      zRoot, statsCols = Seq("l_orderkey", "l_partkey"))
    val linRoot = freshRoot()
    VersionedTable.write(
      li.repartitionByRange(16, col("l_orderkey")),
      linRoot, statsCols = Seq("l_orderkey", "l_partkey"))

    // narrow predicate on l_partkey — the NON-leading key of the linear sort
    val lo = bmin + (bmax - bmin) / 2.0
    val hi = lo + (bmax - bmin) / 16.0
    val zScan = VersionedTable.readPruned(spark, zRoot, "l_partkey", lo, hi)
    val linScan = VersionedTable.readPruned(spark, linRoot, "l_partkey", lo, hi)

    // same answer either way
    assert(zScan.count() == linScan.count())
    // linear-by-orderkey files all span the full partkey range: no skipping;
    // z-ordered files are clustered in both dims: must skip a real fraction
    assert(linScan.inputFiles.length == 16,
      s"linear sort should read all 16 files, read ${linScan.inputFiles.length}")
    assert(zScan.inputFiles.length <= 12,
      s"z-order should skip >=4 of 16 files, read ${zScan.inputFiles.length}")
  }

  test("gvt.dataSkippingCols: every commit auto-collects zone maps — " +
    "appends AND the UPDATE_DV slice stay prunable, no per-call statsCols") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.write(
      (1 to 400).map(i => (i.toLong, s"s$i")).toDF("k", "s")
        .repartitionByRange(4, col("k")), root, statsCols = Seq("k"))
    VersionedTable.setTblProperties(root,
      Map("gvt.dataSkippingCols" -> "k, missing_col"))
    // append WITHOUT statsCols: the property collects for it
    VersionedTable.append(
      (401 to 800).map(i => (i.toLong, s"s$i")).toDF("k", "s")
        .repartitionByRange(4, col("k")), root)
    assert(new java.io.File(s"$root/v=2/_stats").exists(),
      "property-driven stats missing on the append commit")
    // DML: the UPDATE_DV slice gets stats too (v3 data = updated rows)
    VersionedTable.updateWhereVector(spark, root, col("k") <= 100,
      Map("s" -> concat(lit("u"), col("s"))))
    assert(new java.io.File(s"$root/v=3/_stats").exists(),
      "property-driven stats missing on the UPDATE_DV slice")
    // and the whole chain prunes: a range over the untouched top files
    // must not read the low-range files of ANY commit
    val pruned = VersionedTable.readPruned(spark, root, "k", 601, 700)
    assert(pruned.count() == 100)
    val perDir = pruned.inputFiles.toSeq.filterNot(_.contains("/_dv"))
      .groupBy(f => "v=\\d+".r.findFirstIn(f).getOrElse("?"))
      .view.mapValues(_.size).toMap
    assert(perDir.getOrElse("v=2", 0) < 4,
      s"append files must prune via the auto stats: $perDir")
    assert(perDir.getOrElse("v=3", 0) == 0,
      s"the low-range UPDATE slice must prune away entirely: $perDir")
  }
}
