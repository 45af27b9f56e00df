package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Partition-scoped OPTIMIZE (Delta `OPTIMIZE t WHERE …`): rewrite only
  * the selected hive partitions as one DV commit — untouched partitions'
  * files stay byte-identical, the optimized partition's old files drop
  * out of subsequent scans via whole-file DV elision, content is
  * unchanged, and the hop is CDF-neutral. */
class OptimizeWhereSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def mk(root: String): Unit = {
    val df = (1 to 300).map(i =>
      (i.toLong, (i % 3) match { case 0 => "a"; case 1 => "b"; case _ => "c" },
        i * 2.0)).toDF("id", "part", "x")
    // three appends → many small files per partition
    VersionedTable.write(df.filter(col("id") <= 100), root,
      partitionBy = Seq("part"))
    VersionedTable.append(df.filter(col("id") > 100 && col("id") <= 200), root)
    VersionedTable.append(df.filter(col("id") > 200), root)
  }

  private def files(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.inputFiles.toSeq.filterNot(_.contains("/_dv"))

  test("OPTIMIZE WHERE rewrites only the selected partition") {
    val root = fresh("optw")
    mk(root)
    val before = VersionedTable.readLatest(spark, root)
      .orderBy("id").collect().toSeq
    val v3 = VersionedTable.latestVersion(root).get
    val nv = VersionedTable.compactWhere(spark, root, col("part") === "a")
    assert(nv == v3 + 1)
    // content identical
    val after = VersionedTable.readLatest(spark, root)
    assert(after.orderBy("id").collect().toSeq == before)
    // the rewrite touched ONLY the selected partition: the new commit
    // holds a part=a dir and nothing else; the untouched partitions'
    // bytes were never rewritten (their dirs are immutable chain state)
    val nvParts = new java.io.File(s"$root/v=$nv").listFiles()
      .filter(f => f.isDirectory && f.getName.contains("=")).map(_.getName).toSeq
    assert(nvParts == Seq("part=a"), s"rewrite leaked beyond WHERE: $nvParts")
    // the optimized partition plans ONLY the rewrite's files — the old
    // part=a files are fully DV-masked and ELIDED from the relation
    val all = files(after)
    assert(all.exists(_.contains(s"/v=$nv/part=a")))
    assert(!all.exists(f => f.contains("part=a") && !f.contains(s"/v=$nv/")),
      s"stale part=a files still planned:\n${all.mkString("\n")}")
    // untouched partitions keep serving from the ORIGINAL chain dirs
    assert(all.exists(f => f.contains("/v=1/part=b")))
    assert(all.exists(f => f.contains("/v=3/part=c")))
    // history records the scoped operation
    val op = VersionedTable.history(spark, root)
      .filter(col("version") === nv).select("operation").head.getString(0)
    assert(op.startsWith("OPTIMIZE_WHERE"))
  }

  test("ZORDER BY within the selected partition collects zone maps") {
    val root = fresh("optwz")
    mk(root)
    val nv = VersionedTable.compactWhere(spark, root, col("part") === "b",
      zorderBy = Seq("id", "x"))
    assert(VersionedTable.readLatest(spark, root).count() == 300)
    // the rewrite's dir carries stats for the z-order columns
    val st = spark.read.parquet(s"$root/v=$nv/_stats")
    assert(st.columns.contains("min_id") && st.columns.contains("min_x"))
  }

  test("no matching partition is a no-op, not an empty rewrite") {
    val root = fresh("optwn")
    mk(root)
    val v = VersionedTable.latestVersion(root).get
    assert(VersionedTable.compactWhere(spark, root, col("part") === "zzz") == v)
    assert(VersionedTable.latestVersion(root).get == v)
  }

  test("data-column predicates and unpartitioned tables refuse loudly") {
    val root = fresh("optwr")
    mk(root)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.compactWhere(spark, root, col("id") > 10)
    }
    assert(e.getMessage.contains("partition columns only"))
    val flat = fresh("optwf")
    VersionedTable.write((1 to 10).toDF("id"), flat)
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.compactWhere(spark, flat, col("id") > 1)
    }
    assert(e2.getMessage.contains("not hive-partitioned"))
  }

  test("the optimize hop is CDF-neutral, keyed and keyless") {
    val root = fresh("optwc")
    mk(root)
    val v = VersionedTable.latestVersion(root).get
    val nv = VersionedTable.compactWhere(spark, root, col("part") === "c")
    assert(VersionedTable.changes(spark, root, v, nv, Seq("id")).count() == 0)
    assert(VersionedTable.changes(spark, root, v, nv).count() == 0)
    // and a real DML after the optimize still feeds
    val dv = VersionedTable.deleteWhereVector(spark, root, col("id") === 3)
    val feed = VersionedTable.changes(spark, root, nv, dv)
    assert(feed.count() == 1 &&
      feed.head.getAs[String]("_change_type") == "delete")
  }

  test("gvt.optimize.minFileBytes makes scoped OPTIMIZE idempotent: a " +
    "packed partition re-churns nothing on repeat runs") {
    val root = fresh("optwi")
    mk(root)
    val v1 = VersionedTable.compactWhere(spark, root, col("part") === "a",
      minFileBytes = Some(32L * 1024 * 1024))
    assert(v1 == VersionedTable.latestVersion(root).get)
    val before = VersionedTable.readLatest(spark, root)
      .orderBy("id").collect().toSeq
    // second scheduled run: every part=a file is now >= packed — the
    // small-file filter finds < 2 candidates and the call is a NO-OP
    // (same version back, no new commit, no DV churn)
    val v2 = VersionedTable.compactWhere(spark, root, col("part") === "a",
      minFileBytes = Some(32L * 1024 * 1024))
    assert(v2 == v1, s"repeat scoped OPTIMIZE must no-op (v1=$v1, v2=$v2)")
    assert(VersionedTable.readLatest(spark, root)
      .orderBy("id").collect().toSeq == before)
    // and the SQL surface honors the table property on the WHERE path
    GraftSession.withExtensions(spark) { sess =>
      sess.sql(s"ALTER TABLE gvt.`$root` SET TBLPROPERTIES " +
        "('gvt.optimize.minFileBytes' = '33554432')")
      val nv = sess.sql(s"OPTIMIZE gvt.`$root` WHERE part = 'a'")
        .head.getLong(0)
      assert(nv == v1, s"SQL scoped OPTIMIZE must honor minFileBytes ($nv)")
    }
  }

  test("hive-escaped partition values match their WHERE predicate " +
    "(%xx directory names decode before the compare)") {
    val root = fresh("optwe")
    // partition values with characters hive escapes in directory names
    val df = (1 to 60).map(i =>
      (i.toLong, if (i % 2 == 0) "a b" else "x:y")).toDF("id", "part")
    VersionedTable.write(df.filter(col("id") <= 30), root,
      partitionBy = Seq("part"))
    VersionedTable.append(df.filter(col("id") > 30), root)
    val dirNames = new java.io.File(s"$root/v=1").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirNames.exists(_.contains("%")),
      s"fixture expects escaped dir names, got $dirNames")
    val v = VersionedTable.latestVersion(root).get
    val nv = VersionedTable.compactWhere(spark, root, col("part") === "a b")
    assert(nv == v + 1,
      "an escaped-name partition matching the predicate must rewrite, " +
        "not silently no-op")
    val live = VersionedTable.readLatest(spark, root)
    assert(live.count() == 60)
    assert(live.filter(col("part") === "a b").count() == 30)
  }

  test("SQL: OPTIMIZE t WHERE … [ZORDER BY] parses and runs") {
    val root = fresh("optws")
    mk(root)
    GraftSession.withExtensions(spark) { sess =>
      val nv = sess.sql(s"OPTIMIZE gvt.`$root` WHERE part = 'a'")
        .head.getLong(0)
      assert(nv == 4L)
      val nv2 = sess.sql(
        s"OPTIMIZE gvt.`$root` WHERE part = 'b' ZORDER BY (id, x)")
        .head.getLong(0)
      assert(nv2 == 5L)
    }
    assert(VersionedTable.readLatest(spark, root).count() == 300L)
  }
}
