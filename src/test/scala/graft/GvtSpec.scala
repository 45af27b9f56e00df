package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** The `gvt` DataSource: `spark.read.format("gvt")` + SQL over
  * registered relations, planning through a custom FileIndex whose
  * `listFiles` applies zone-map file skipping — pruned files never
  * reach the scan (asserted on the executed FileSourceScanExec's
  * numFiles metric, the post-pruning truth). */
class GvtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot() =
    Files.createTempDirectory("graft_gvt").toString + "/t"

  /** Executed-scan file count: run the query, then read numFiles off
    * every FileSourceScanExec in the executed plan. */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, s"no file scan in:\n${df.queryExecution.executedPlan}")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("format(gvt) reads latest, versionAsOf and timestampAsOf snapshots") {
    val root = freshRoot()
    VersionedTable.write((1 to 100).toDF("id"), root)
    val ts1 = System.currentTimeMillis
    Thread.sleep(5L)
    VersionedTable.write((1 to 40).toDF("id"), root)
    assert(spark.read.format("gvt").load(root).count() == 40)
    assert(spark.read.format("gvt").option("versionAsOf", "1")
      .load(root).count() == 100)
    assert(spark.read.format("gvt").option("timestampAsOf", ts1.toString)
      .load(root).count() == 100)
  }

  test("pushed range predicates prune files at planning via zone maps") {
    val root = freshRoot()
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    VersionedTable.write(orders.repartitionByRange(8, col("o_orderkey")),
      root, statsCols = Seq("o_orderkey"))
    val keys = orders.agg(min("o_orderkey"), max("o_orderkey")).head
    val (kLo, kHi) = (keys.getLong(0), keys.getLong(1))
    val lo = kLo + (kHi - kLo) / 3
    val hi = kLo + (kHi - kLo) / 2
    val t = spark.read.format("gvt").load(root)
    // unfiltered: all 8 files reach the scan
    assert(scannedFiles(t) == 8)
    // a pushed range filter prunes in listFiles — BEFORE the scan
    val q = t.filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi)
    val n = scannedFiles(q)
    assert(n < 8 && n >= 1, s"zone maps must prune the file list, scanned $n/8")
    // pruning is result-invisible
    assert(q.count() ==
      orders.filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi).count())
    // an unstatted column's filter scans everything (no unsound skip)
    assert(scannedFiles(t.filter(col("o_custkey") === 1)) == 8)
  }

  test("multi-column conjunction prunes at least as hard as either column") {
    val root = freshRoot()
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val b = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head
    val (amin, amax, bmin, bmax) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val zk = graft.ops.ZOrder.zorder2(
      graft.ops.ZOrder.rangeBucket(col("l_orderkey"), lit(amin), lit(amax), 16),
      graft.ops.ZOrder.rangeBucket(col("l_partkey"), lit(bmin), lit(bmax), 16))
    VersionedTable.write(
      li.withColumn("zk", zk).repartitionByRange(16, col("zk")).drop("zk"),
      root, statsCols = Seq("l_orderkey", "l_partkey"))
    val t = spark.read.format("gvt").load(root)
    val aPred = col("l_orderkey") >= (amin + (amax - amin) / 2) &&
      col("l_orderkey") <= (amin + (amax - amin) / 2 + (amax - amin) / 8)
    val bPred = col("l_partkey") >= (bmin + (bmax - bmin) / 2) &&
      col("l_partkey") <= (bmin + (bmax - bmin) / 2 + (bmax - bmin) / 8)
    val one = scannedFiles(t.filter(aPred))
    val both = scannedFiles(t.filter(aPred && bPred))
    assert(both <= one && both < 16,
      s"2-col pruning ($both files) must not exceed 1-col ($one files)")
    assert(t.filter(aPred && bPred).count() == li.filter(aPred && bPred).count())
  }

  test("append chains read through gvt; per-batch stats prune across version dirs") {
    val root = freshRoot()
    val mk = (r: Range) => r.toDF("id")
    VersionedTable.write(mk(1 to 1000).repartition(3), root,
      statsCols = Seq("id"))
    VersionedTable.append(mk(1001 to 2000).repartition(3), root,
      statsCols = Seq("id"))
    VersionedTable.append(mk(2001 to 3000).repartition(3), root,
      statsCols = Seq("id"))
    val t = spark.read.format("gvt").load(root)
    assert(t.count() == 3000)
    val total = scannedFiles(t)
    assert(total >= 9)
    // a range inside the middle batch: the other batches' files skip
    val q = t.filter(col("id") >= 1200 && col("id") <= 1400)
    assert(scannedFiles(q) <= total / 2,
      s"chain zone maps must prune: ${scannedFiles(q)}/$total")
    assert(q.count() == 201)
  }

  test("SQL surface: temp view USING gvt, time travel, partition pruning") {
    val root = freshRoot()
    val mk = (r: Range) => r.toDF("id").withColumn("part", (col("id") % 2).cast("int"))
    VersionedTable.write(mk(1 to 40), root, partitionBy = Seq("part"))
    VersionedTable.append(mk(41 to 60), root)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gvt_t USING gvt OPTIONS (path '$root')")
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gvt_t_v1 USING gvt
      OPTIONS (path '$root', versionAsOf '1')""")
    assert(spark.sql("SELECT count(*) AS n FROM gvt_t").as[Long].head() == 60)
    assert(spark.sql("SELECT count(*) AS n FROM gvt_t_v1").as[Long].head() == 40)
    // hive partition pruning flows through the SQL relation
    val q = spark.sql("SELECT id FROM gvt_t WHERE part = 0")
    q.collect()
    val scans = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "partition filter must reach the gvt scan")
    assert(q.count() == 30)
  }

  test("narrowing casts on the filter column never mis-prune; widening casts still prune") {
    val root = freshRoot()
    // two files with disjoint double ranges: [1.0,2.0] and [5.2,5.7] —
    // NO file contains the exact value 5.0, but file 2's rows DO
    // satisfy cast(d AS int) = 5 (5.2..5.7 truncate to 5)
    val df = Seq(1.0, 1.5, 2.0, 5.2, 5.4, 5.7).toDF("d")
      .withColumn("i", (col("d") * 10).cast("long"))
    VersionedTable.write(df.repartitionByRange(2, col("d")), root,
      statsCols = Seq("d", "i"))
    val t = spark.read.format("gvt").load(root)
    assert(scannedFiles(t) == 2)
    // a narrowing cast must contribute NO zone-map bound: pruning on
    // [5,5] would skip the [5.2,5.7] file whose rows genuinely match
    val q = t.filter(col("d").cast("int") === 5)
    assert(q.count() == 3, "rows truncating to 5 must survive")
    assert(scannedFiles(q) == 2, "a narrowing cast must not prune")
    // a VALUE-PRESERVING cast (long → double is the stats map itself)
    // keeps pruning: i in [52,57] lives in one file
    val w = t.filter(col("i").cast("double") === 54.0)
    assert(w.count() == 1)
    assert(scannedFiles(w) == 1, "value-preserving casts should still prune")
  }

  test("DV-bearing snapshots read through gvt/SQL: vectors applied, pruning preserved") {
    val root = freshRoot()
    VersionedTable.write(
      (1 to 800).map(i => (i.toLong, i % 10)).toDF("id", "grp")
        .repartitionByRange(8, col("id")),
      root, statsCols = Seq("id"))
    // DV DELETE + DV UPDATE land; NO compact — the exact sequence that
    // used to throw on any gvt/SQL read
    VersionedTable.deleteWhereVector(spark, root, col("id") <= 100)
    VersionedTable.updateWhereVector(spark, root, col("id") === 500L,
      Map("grp" -> lit(-1)))
    val t = spark.read.format("gvt").load(root)
    assert(t.count() == 700)
    assert(t.filter(col("grp") === -1).select("id").as[Long].collect().toSeq
      == Seq(500L))
    // SQL over a view (the reference's consumption shape)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gvt_dv USING gvt OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) AS n FROM gvt_dv").as[Long].head() == 700)
    assert(spark.sql("SELECT sum(grp) AS s FROM gvt_dv WHERE id = 500")
      .as[Long].head() == -1L)
    // zone-map pruning still fires on the DV path: a tight range scans
    // a strict subset of the 8 base files
    graft.sources.gvt.GvtDvRelation.captureScanFiles = true
    graft.sources.gvt.GvtDvRelation.lastScanFiles = -1
    val q = spark.sql("SELECT count(*) AS n FROM gvt_dv WHERE id >= 301 AND id <= 350")
    assert(q.as[Long].head() == 50)
    val scanned = graft.sources.gvt.GvtDvRelation.lastScanFiles
    graft.sources.gvt.GvtDvRelation.captureScanFiles = false
    assert(scanned >= 1 && scanned < 8,
      s"DV-path zone maps must prune the file list, scanned $scanned/8")
    // column projection reaches the inner scan too (no crash, right values)
    assert(spark.sql("SELECT grp FROM gvt_dv WHERE id = 500").as[Int].head() == -1)
    // time travel to the pre-DV snapshot still serves the fast
    // HadoopFsRelation path with all rows
    assert(spark.read.format("gvt").option("versionAsOf", "1")
      .load(root).count() == 800)
    // compaction materializes the vectors; reads flip back to the
    // planning-time-pruned relation with identical results
    VersionedTable.compact(spark, root)
    spark.catalog.refreshTable("gvt_dv")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gvt_dv USING gvt OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) AS n FROM gvt_dv").as[Long].head() == 700)
  }

  test("string zone maps: equality/range pruning, truncation + all-null soundness") {
    val root = freshRoot()
    // 8 statuses clustered one-per-file; ids interleave
    val df = (1 to 800).map(i => (i.toLong, ('A' + i % 8).toChar.toString))
      .toDF("id", "status")
    VersionedTable.write(df.repartitionByRange(8, col("status")), root,
      statsCols = Seq("status", "id"))
    val t = spark.read.format("gvt").load(root)
    assert(scannedFiles(t) == 8)
    // string EQUALITY prunes at planning (the reference's dominant
    // scope-filter shape: o_orderstatus = 'F')
    val q = t.filter(col("status") === "C")
    assert(q.count() == 100)
    assert(scannedFiles(q) < 8, "string equality must prune files")
    // lexicographic RANGE prunes too (statuses G and H = 2 of 8 files)
    val r = t.filter(col("status") >= "G")
    assert(r.count() == 200 && scannedFiles(r) < 8)
    // result-invisible: residual filter still applies inside kept files
    assert(t.filter(col("status") === "C" && col("id") <= 400).count() == 50)

    // truncation soundness: >64-char strings make smax UNBOUNDED, so
    // upper-bound checks keep the file instead of mis-pruning
    val root2 = freshRoot()
    val long = (0 to 9).map(i => ("y" * 100) + i.toString).toDF("s")
    VersionedTable.write(long.coalesce(1), root2, statsCols = Seq("s"))
    val t2 = spark.read.format("gvt").load(root2)
    assert(t2.filter(col("s") === (("y" * 100) + "5")).count() == 1,
      "truncated smax must not prune the matching file")

    // a genuinely all-NULL file is skipped on any string predicate
    val root3 = freshRoot()
    val mixed = (1 to 100).map(i =>
      (i, if (i <= 50) null else s"v$i")).toDF("id", "s")
    VersionedTable.write(mixed.repartitionByRange(2, col("id")), root3,
      statsCols = Seq("s"))
    val t3 = spark.read.format("gvt").load(root3)
    val q3 = t3.filter(col("s") === "v77")
    assert(q3.count() == 1)
    assert(scannedFiles(q3) == 1, "the all-null file must skip")
  }

  test("writer options: mergeSchema evolves appends, replaceWhere scopes overwrites") {
    val root = freshRoot()
    (1 to 40).map(i => (i, i % 4)).toDF("id", "grp")
      .write.format("gvt").mode("overwrite").save(root)
    // un-evolved append with a new column fails; mergeSchema admits it
    intercept[IllegalArgumentException] {
      Seq((41, 1, "x")).toDF("id", "grp", "tag")
        .write.format("gvt").mode("append").save(root)
    }
    Seq((41, 1, "x")).toDF("id", "grp", "tag")
      .write.format("gvt").option("mergeSchema", "true").mode("append").save(root)
    val live = spark.read.format("gvt").load(root)
    assert(live.count() == 41 && live.filter(col("tag").isNotNull).count() == 1)
    // replaceWhere: swap EXACTLY grp=1's rows in one commit
    VersionedTable.compact(spark, root) // fold the evolved chain first
    Seq((1001, 1, "new"), (1002, 1, "new")).toDF("id", "grp", "tag")
      .write.format("gvt").option("replaceWhere", "grp = 1")
      .mode("overwrite").save(root)
    val after = spark.read.format("gvt").load(root)
    assert(after.filter(col("grp") === 1).count() == 2)
    assert(after.filter(col("grp") =!= 1).count() == 30) // untouched scope
    assert(VersionedTable.history(spark, root).select("operation")
      .as[String].head() == "REPLACE_WHERE")
    // out-of-scope incoming rows fail the whole write
    intercept[VersionedTable.CheckConstraintViolation] {
      Seq((2000, 2, "bad")).toDF("id", "grp", "tag")
        .write.format("gvt").option("replaceWhere", "grp = 1")
        .mode("overwrite").save(root)
    }
    // replaceWhere demands mode Overwrite
    intercept[IllegalArgumentException] {
      Seq((3000, 1, "z")).toDF("id", "grp", "tag")
        .write.format("gvt").option("replaceWhere", "grp = 1")
        .mode("append").save(root)
    }
  }

  test("write path: Overwrite = new snapshot, Append = O(batch) append commit") {
    val root = freshRoot()
    (1 to 100).toDF("id").write.format("gvt")
      .option("statsCols", "id").mode("overwrite").save(root)
    (101 to 120).toDF("id").write.format("gvt")
      .option("statsCols", "id").mode("append").save(root)
    assert(VersionedTable.history(spark, root).select("operation")
      .as[String].collect().toSet == Set("WRITE", "APPEND"))
    // the append landed O(batch): its dir holds only the delta
    assert(spark.read.parquet(s"$root/v=2").count() == 20)
    assert(spark.read.format("gvt").load(root).count() == 120)
    (1 to 50).toDF("id").write.format("gvt").mode("overwrite").save(root)
    assert(spark.read.format("gvt").load(root).count() == 50)
    assert(spark.read.format("gvt").option("versionAsOf", "2").load(root).count() == 120)
  }

  test("optimizeWrite: an AQE rebalance packs files at write time; " +
      "the table property makes it the default for data arrivals") {
    val sliver = (1 to 4000).map(i => (i.toLong, s"p${i % 2}"))
      .toDF("id", "p").repartition(12) // 12 upstream tasks × 2 partitions
    val plain = freshRoot()
    VersionedTable.write(sliver, plain, partitionBy = Seq("p"))
    val filesPlain = VersionedTable.readLatest(spark, plain).inputFiles.length
    val packed = freshRoot()
    VersionedTable.write(sliver, packed, partitionBy = Seq("p"),
      optimizeWrite = Some(true))
    val tPacked = VersionedTable.readLatest(spark, packed)
    val filesPacked = tPacked.inputFiles.length
    assert(filesPacked < filesPlain,
      s"expected fewer files: $filesPacked vs $filesPlain")
    assert(filesPacked <= 4, s"tiny partitions should coalesce: $filesPacked")
    assert(tPacked.count() == 4000)
    assert(tPacked.filter(col("p") === "p1").count() == 2000)
    // the table property turns it on for appends (data-arrival paths)
    VersionedTable.setTblProperties(packed,
      Map("gvt.optimizeWrite" -> "true"))
    VersionedTable.append((4001 to 8000).map(i => (i.toLong, s"p${i % 2}"))
      .toDF("id", "p").repartition(12), packed)
    val v2Files = spark.read.parquet(
      s"$packed/v=${VersionedTable.latestVersion(packed).get}")
      .inputFiles.length
    assert(v2Files <= 4, s"property-driven append should pack: $v2Files")
    assert(VersionedTable.readLatest(spark, packed).count() == 8000)
  }

  test("a DV-bearing gvt dim still auto-broadcasts in joins " +
      "(real sizeInBytes, not the never-broadcast default)") {
    val root = freshRoot()
    VersionedTable.write((1 to 100).map(i => (i.toLong, s"name$i"))
      .toDF("k", "name"), root)
    VersionedTable.deleteWhereVector(spark, root, col("k") % 10 === 0L)
    val fact = spark.range(0, 20000)
      .select(($"id" % 100 + 1).as("k"), $"id".as("x"))
    val dim = spark.read.format("gvt").load(root) // DV path: GvtDvRelation
    val j = fact.join(dim, "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the tiny DV-bearing dim to broadcast:\n$plan")
    // 90 live dim keys × 200 fact rows each
    assert(j.count() == 90L * 200)
  }
}
