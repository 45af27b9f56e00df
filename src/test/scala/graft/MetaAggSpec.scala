package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** [[graft.plans.MetaAggRewrite]] — metadata-only global aggregates
  * over gvt relations (the Delta OptimizeMetadataOnlyDeltaQuery
  * analogue). Each positive case asserts BOTH the answer and the plan
  * shape (LocalTableScan, zero file scans); each negative case asserts
  * the scan stands AND the answer is still correct — the rewrite must
  * never trade soundness for the shortcut. */
class MetaAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertMetaOnly(df: DataFrame): Unit = {
    val p = planOf(df)
    assert(p.contains("LocalTableScan"), s"expected metadata fold:\n$p")
    assert(!p.contains("Scan parquet") && !p.contains("FileScan"),
      s"expected zero file scans:\n$p")
  }

  private def assertScans(df: DataFrame): Unit = {
    val p = planOf(df)
    assert(!p.contains("LocalTableScan"), s"expected a real scan:\n$p")
  }

  test("count(*) / count(lit) fold to footer row counts — zero tasks") {
    val root = fresh("metacnt")
    val df = (1 to 500).map(i => (i.toLong, s"g${i % 7}")).toDF("id", "g")
    VersionedTable.write(df, root)
    VersionedTable.append((501L to 620L).toDF("id")
      .withColumn("g", concat(lit("g"), ($"id" % 7).cast("string"))), root)
    GraftSession.withExtensions(spark) { sess =>
      val t = sess.read.format("gvt").load(root)
      val out = t.agg(count(lit(1)).as("n"), count(lit("x")).as("m"))
      assertMetaOnly(out)
      assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((620L, 620L)))
      // SQL spelling, via a view over the same chain
      sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW meta_cnt USING gvt " +
        s"OPTIONS (path '$root')")
      val sq = sess.sql("SELECT count(*) AS n FROM meta_cnt")
      assertMetaOnly(sq)
      assert(sq.collect().head.getLong(0) == 620L)
    }
  }

  test("min/max over statted integral columns fold from zone maps") {
    val root = fresh("metamm")
    val df = (1 to 300).map(i => (i.toLong, i * 2, s"d${i % 5}"))
      .toDF("id", "v", "g")
    VersionedTable.write(df, root, statsCols = Seq("id", "v"))
    VersionedTable.append(
      (301 to 360).map(i => (i.toLong, i * 2, s"d${i % 5}"))
        .toDF("id", "v", "g"), root, statsCols = Seq("id", "v"))
    GraftSession.withExtensions(spark) { sess =>
      val t = sess.read.format("gvt").load(root)
      val out = t.agg(min("id").as("lo"), max("id").as("hi"),
        max("v").as("vmax"), count(lit(1)).as("n"))
      assertMetaOnly(out)
      val r = out.collect().head
      assert((r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)) ==
        ((1L, 360L, 720, 360L)))
    }
  }

  test("unstatted min/max, DISTINCT, filters, grouping: scan stands, " +
      "answers unchanged") {
    val root = fresh("metaneg")
    val df = (1 to 200).map(i => (i.toLong, s"s$i")).toDF("id", "s")
    VersionedTable.write(df, root) // no statsCols
    GraftSession.withExtensions(spark) { sess =>
      val t = sess.read.format("gvt").load(root)
      val noStats = t.agg(min("id").as("lo"), count(lit(1)).as("n"))
      assertScans(noStats) // one unanswerable expr → the WHOLE agg scans
      assert(noStats.collect().head.getLong(0) == 1L)
      val distinct = t.agg(countDistinct("id").as("n"))
      assertScans(distinct)
      assert(distinct.collect().head.getLong(0) == 200L)
      val filtered = t.filter($"id" > 100).agg(count(lit(1)).as("n"))
      assertScans(filtered)
      assert(filtered.collect().head.getLong(0) == 100L)
      val grouped = t.groupBy($"s").agg(count(lit(1)).as("n"))
      assertScans(grouped)
      assert(grouped.count() == 200L)
    }
  }

  test("deletion-vector snapshots: count(*) folds minus DV cardinality; " +
      "min/max never folds from stale stats") {
    val root = fresh("metadv")
    val df = (1 to 400).map(i => (i.toLong, i % 10)).toDF("id", "m")
    VersionedTable.write(df, root, statsCols = Seq("id"))
    VersionedTable.deleteWhereVector(spark, root, col("id") > 350L)
    GraftSession.withExtensions(spark) { sess =>
      val t = sess.read.format("gvt").load(root)
      val cnt = t.agg(count(lit(1)).as("n"))
      assertMetaOnly(cnt)
      assert(cnt.collect().head.getLong(0) == 350L)
      // the true max (350) is NOT what the file stats say (400): the
      // rewrite must leave min/max to the real DV-resolving scan
      val mm = t.agg(max("id").as("hi"))
      assertScans(mm)
      assert(mm.collect().head.getLong(0) == 350L)
    }
  }

  test("count(col): non-nullable → rows; nullable string → zone-map " +
      "non-null sums; nullable numeric scans") {
    val root = fresh("metann")
    val df = (1 to 240).map { i =>
      (i.toLong, if (i % 4 == 0) null else s"v$i",
        if (i % 3 == 0) None else Some(i * 10L))
    }.toDF("id", "s", "x")
    VersionedTable.write(df, root, statsCols = Seq("s", "x"))
    GraftSession.withExtensions(spark) { sess =>
      val t = sess.read.format("gvt").load(root)
      val sCnt = t.agg(count($"s").as("n"), count(lit(1)).as("rows"))
      assertMetaOnly(sCnt)
      assert(sCnt.collect().map(r => (r.getLong(0), r.getLong(1))).head ==
        ((180L, 240L)))
      val xCnt = t.agg(count($"x").as("n")) // numeric stats carry no nn_
      assertScans(xCnt)
      assert(xCnt.collect().head.getLong(0) == 160L)
    }
  }

  test("time travel folds against the pinned version's metadata") {
    val root = fresh("metatt")
    VersionedTable.write((1 to 100).map(i => Tuple1(i.toLong)).toDF("id"),
      root, statsCols = Seq("id"))
    VersionedTable.append((101L to 130L).toDF("id"), root,
      statsCols = Seq("id"))
    GraftSession.withExtensions(spark) { sess =>
      val v1 = sess.read.format("gvt").option("versionAsOf", "1")
        .load(root).agg(count(lit(1)).as("n"), max("id").as("hi"))
      assertMetaOnly(v1)
      val r = v1.collect().head
      assert((r.getLong(0), r.getLong(1)) == ((100L, 100L)))
    }
  }

  test("escape hatch: spark.graft.metaAgg.enabled=false restores the scan") {
    val root = fresh("metaoff")
    VersionedTable.write((1 to 50).map(i => Tuple1(i)).toDF("id"), root)
    GraftSession.withExtensions(spark) { sess =>
      sess.conf.set("spark.graft.metaAgg.enabled", "false")
      try {
        val out = sess.read.format("gvt").load(root)
          .agg(count(lit(1)).as("n"))
        assertScans(out)
        assert(out.collect().head.getLong(0) == 50L)
      } finally sess.conf.unset("spark.graft.metaAgg.enabled")
    }
  }

  test("model-based: random tables × aggregate shapes — the folded " +
      "answer always equals the real scan's") {
    val rnd = new scala.util.Random(20260815L)
    for (iter <- 1 to 5) {
      val root = fresh(s"metamodel$iter")
      val usePart = rnd.nextBoolean()
      def batch(lo: Int, hi: Int) = (lo to hi).map { i =>
        (i.toLong,
          if (rnd.nextInt(5) == 0) null else s"v${rnd.nextInt(40)}",
          rnd.nextInt(90000).toLong,
          s"p${rnd.nextInt(4)}", rnd.nextInt(3))
      }.toDF("id", "s", "x", "p", "q")
      val n1 = 40 + rnd.nextInt(120)
      VersionedTable.write(batch(1, n1), root,
        partitionBy = if (usePart) Seq("p", "q") else Seq.empty,
        statsCols = Seq("id", "s"))
      if (rnd.nextBoolean())
        VersionedTable.append(batch(n1 + 1, n1 + 30 + rnd.nextInt(60)), root,
          statsCols = if (rnd.nextBoolean()) Seq("id", "s") else Seq.empty)
      if (rnd.nextInt(3) == 0) // a DV chain must stay correct too
        VersionedTable.deleteWhereVector(spark, root,
          col("id") % (3 + rnd.nextInt(5)) === 0L)
      GraftSession.withExtensions(spark) { sess =>
        val shapes: Seq[org.apache.spark.sql.DataFrame =>
            org.apache.spark.sql.DataFrame] = Seq(
          _.agg(count(lit(1)).as("n"), min("id").as("lo"),
            max("id").as("hi"), count($"s").as("ns")),
          _.agg(count(lit(1)).as("n"), max($"x").as("hx")),
          _.groupBy($"p").agg(count(lit(1)).as("n"), min("id").as("lo")),
          _.filter($"p" >= "p1").agg(count(lit(1)).as("n"),
            max("id").as("hi")),
          _.filter($"q" === 1).groupBy($"p")
            .agg(count(lit(1)).as("n"), count($"s").as("ns")),
          _.groupBy($"p", $"q").agg(count(lit(1)).as("n"),
            max($"p").as("mp")),
          _.filter($"p" === "nope").agg(count(lit(1)).as("n"),
            min("id").as("lo")))
        shapes.zipWithIndex.foreach { case (shape, si) =>
          def run(): Seq[String] =
            shape(sess.read.format("gvt").load(root))
              .collect().map(_.toString).sorted.toSeq
          val folded = run()
          sess.conf.set("spark.graft.metaAgg.enabled", "false")
          val scanned = try run()
            finally sess.conf.unset("spark.graft.metaAgg.enabled")
          assert(folded == scanned,
            s"iter=$iter shape=$si usePart=$usePart:\n" +
              s"folded=$folded\nscanned=$scanned")
        }
      }
    }
  }

  test("partitioned chains fold: footer counts walk hive subdirs") {
    val root = fresh("metapart")
    val df = (1 to 180).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "p")
    VersionedTable.write(df, root, partitionBy = Seq("p"),
      statsCols = Seq("id"))
    GraftSession.withExtensions(spark) { sess =>
      val t = sess.read.format("gvt").load(root)
      val out = t.agg(count(lit(1)).as("n"), min("id").as("lo"))
      assertMetaOnly(out)
      val r = out.collect().head
      assert((r.getLong(0), r.getLong(1)) == ((180L, 1L)))
    }
  }

  test("GROUP BY partition column folds: per-partition footer counts + " +
      "zone-map extremes, across an append chain") {
    val root = fresh("metagrp")
    val df = (1 to 150).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "p")
    VersionedTable.write(df, root, partitionBy = Seq("p"),
      statsCols = Seq("id"))
    // second chain member repeats partition values — groups must merge
    VersionedTable.append((151 to 210).map(i => (i.toLong, s"p${i % 2}"))
      .toDF("id", "p"), root, statsCols = Seq("id"))
    GraftSession.withExtensions(spark) { sess =>
      val t = sess.read.format("gvt").load(root)
      val out = t.groupBy($"p").agg(count(lit(1)).as("n"),
        min("id").as("lo"), max("id").as("hi"))
      assertMetaOnly(out)
      val got = out.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val exp = ((1 to 150).map(i => (s"p${i % 3}", i.toLong)) ++
          (151 to 210).map(i => (s"p${i % 2}", i.toLong)))
        .groupBy(_._1).map { case (p, xs) =>
          (p, xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max)
        }.toSeq.sortBy(_._1)
      assert(got == exp)
      // grouping by a NON-partition column: the scan stands
      val byData = t.groupBy($"id").agg(count(lit(1)).as("n"))
      assertScans(byData)
      assert(byData.count() == 210L)
    }
  }

  test("min/max on partition columns fold from directory values — " +
      "string and integral, global shape") {
    val root = fresh("metapmm")
    val df = (1 to 120).map(i => (i.toLong, s"d${i % 4}", i % 5))
      .toDF("id", "dt", "bucket")
    VersionedTable.write(df, root, partitionBy = Seq("dt", "bucket"))
    GraftSession.withExtensions(spark) { sess =>
      val t = sess.read.format("gvt").load(root)
      // no statsCols at all: partition values alone answer these
      val out = t.agg(max($"dt").as("max_dt"), min($"dt").as("min_dt"),
        max($"bucket").as("max_b"), count(lit(1)).as("n"))
      assertMetaOnly(out)
      val r = out.collect().head
      assert((r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)) ==
        (("d3", "d0", 4, 120L)))
    }
  }

  test("filters over PARTITION columns fold (exact dir-level eval); " +
      "any data-column reference restores the scan") {
    val root = fresh("metafilt")
    val df = (1 to 200).map(i => (i.toLong, s"d${i % 4}", i % 3))
      .toDF("id", "dt", "b")
    VersionedTable.write(df, root, partitionBy = Seq("dt", "b"),
      statsCols = Seq("id"))
    GraftSession.withExtensions(spark) { sess =>
      val t = sess.read.format("gvt").load(root)
      // single partition predicate — the count(*) WHERE date shape
      val one = t.filter($"dt" >= "d2").agg(count(lit(1)).as("n"),
        min("id").as("lo"))
      assertMetaOnly(one)
      val exp = (1 to 200).filter(i => s"d${i % 4}" >= "d2")
      assert(one.collect().map(r => (r.getLong(0), r.getLong(1))).head ==
        ((exp.size.toLong, exp.min.toLong)))
      // conjunction of partition predicates, plus grouping
      val grouped = t.filter($"dt" =!= "d0" && $"b" === 1)
        .groupBy($"dt").agg(count(lit(1)).as("n"))
      assertMetaOnly(grouped)
      val expG = (1 to 200).filter(i => s"d${i % 4}" != "d0" && i % 3 == 1)
        .groupBy(i => s"d${i % 4}").view.mapValues(_.size.toLong).toMap
      assert(grouped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == expG)
      // an unsatisfied partition predicate: global agg still emits ONE row
      val none = t.filter($"dt" === "zzz").agg(count(lit(1)).as("n"),
        max("id").as("hi"))
      assertMetaOnly(none)
      val r0 = none.collect().head
      assert(r0.getLong(0) == 0L && r0.isNullAt(1))
      // a data-column conjunct anywhere restores the scan
      val mixed = t.filter($"dt" === "d1" && $"id" > 0)
        .agg(count(lit(1)).as("n"))
      assertScans(mixed)
      assert(mixed.collect().head.getLong(0) == 50L)
    }
  }

  test("null partition values: count(part_col) excludes the default " +
      "partition, min/max skip it") {
    val root = fresh("metapnull")
    val df = (1 to 90).map { i =>
      (i.toLong, if (i % 9 == 0) null else s"s${i % 3}")
    }.toDF("id", "seg")
    VersionedTable.write(df, root, partitionBy = Seq("seg"))
    GraftSession.withExtensions(spark) { sess =>
      val t = sess.read.format("gvt").load(root)
      val out = t.agg(count($"seg").as("nn"), count(lit(1)).as("n"),
        max($"seg").as("hi"))
      assertMetaOnly(out)
      val r = out.collect().head
      assert((r.getLong(0), r.getLong(1), r.getString(2)) ==
        ((80L, 90L, "s2")))
    }
  }
}
