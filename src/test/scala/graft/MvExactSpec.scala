package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MaterializedView, VersionedTable}

/** Exact-match materialized views: arbitrary defining queries (joins,
  * filters, DISTINCT) matched whole-subtree via sameResult, structural
  * freshness, alias-independence, refresh-on-demand. */
class MvExactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** orders + customer slices as two gvt tables. */
  private def mkBases(oRoot: String, cRoot: String): Unit = {
    VersionedTable.write(spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        col("o_orderstatus").as("status"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents")),
      oRoot)
    VersionedTable.write(spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("ck2"), col("c_mktsegment").as("segment")),
      cRoot)
  }

  private def usesMv(df: DataFrame, mvRoot: String): Boolean =
    TestSpark.scansUnder(df, mvRoot)

  private def withViews[A](sess: SparkSession, oRoot: String, cRoot: String,
                           oV: String, cV: String)(f: => A): A = {
    sess.read.format("gvt").load(oRoot).createOrReplaceTempView(oV)
    sess.read.format("gvt").load(cRoot).createOrReplaceTempView(cV)
    f
  }

  test("join-aggregate defining query serves the identical shape — any aliases") {
    val oRoot = tmp("mx_o"); val cRoot = tmp("mx_c"); val mv = tmp("mx_mv")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders", "mx_cust") {
        val defSql =
          """SELECT segment, status, sum(cents) AS sum_cents, count(*) AS n
            |FROM mx_orders JOIN mx_cust ON ck = ck2
            |GROUP BY segment, status""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        // same shape, different output aliases
        val q = sess.sql(
          """SELECT segment, status, sum(cents) AS s, count(*) AS c
            |FROM mx_orders JOIN mx_cust ON ck = ck2
            |GROUP BY segment, status""".stripMargin)
        assert(usesMv(q, mv), q.queryExecution.optimizedPlan.toString)
        val exp = spark.sql("SELECT 1").sparkSession.read.format("gvt")
          .load(oRoot)
          .join(spark.read.format("gvt").load(cRoot), col("ck") === col("ck2"))
          .groupBy("segment", "status")
          .agg(sum("cents").as("s"), count(lit(1)).as("c"))
          .collect().map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
        val got = q.collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
        assert(got == exp)
      }
    }
  }

  test("structural freshness: base advance stops the match; refresh restores it") {
    val oRoot = tmp("mx_o2"); val cRoot = tmp("mx_c2"); val mv = tmp("mx_mv2")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders2", "mx_cust2") {
        val defSql =
          """SELECT segment, sum(cents) AS sum_cents
            |FROM mx_orders2 JOIN mx_cust2 ON ck = ck2
            |GROUP BY segment""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        def q = sess.sql(defSql)
        assert(usesMv(q, mv))
        VersionedTable.append(sess.range(1).select(lit(990000L).as("k"),
          lit(0L).as("ck"), lit("F").as("status"), lit(77L).as("cents")), oRoot)
        // the temp view pins the OLD snapshot — re-register to read live
        sess.read.format("gvt").load(oRoot)
          .createOrReplaceTempView("mx_orders2")
        assert(!usesMv(q, mv), "advanced base must stop the exact match")
        MaterializedView.refresh(sess, mv)
        assert(usesMv(q, mv), "refresh must restore the exact match")
        // and the refreshed MV carries the appended row
        val bySeg = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val direct = sess.read.format("gvt").load(oRoot)
          .join(sess.read.format("gvt").load(cRoot), col("ck") === col("ck2"))
          .groupBy("segment").agg(sum("cents").as("s"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(bySeg == direct)
      }
    }
  }

  test("refresh is a no-op commit-wise when every base is fresh") {
    val oRoot = tmp("mx_o3"); val cRoot = tmp("mx_c3"); val mv = tmp("mx_mv3")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders3", "mx_cust3") {
        MaterializedView.createExact(sess, mv,
          "SELECT status, count(*) AS n FROM mx_orders3 GROUP BY status")
        val before = VersionedTable.latestVersion(mv)
        MaterializedView.refresh(sess, mv)
        assert(VersionedTable.latestVersion(mv) == before,
          "fresh exact view must not commit on refresh")
      }
    }
  }

  test("DISTINCT and filtered shapes — unservable by the aggregate algebra — serve exactly") {
    val oRoot = tmp("mx_o4"); val cRoot = tmp("mx_c4"); val mv = tmp("mx_mv4")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders4", "mx_cust4") {
        val defSql =
          """SELECT status, count(DISTINCT ck) AS n_custs
            |FROM mx_orders4 WHERE cents > 1000 GROUP BY status""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        val q = sess.sql(defSql)
        assert(usesMv(q, mv), q.queryExecution.optimizedPlan.toString)
        val exp = sess.read.format("gvt").load(oRoot)
          .filter(col("cents") > 1000).groupBy("status")
          .agg(countDistinct(col("ck")).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == exp)
      }
    }
  }

  test("a semantically different query does NOT match") {
    val oRoot = tmp("mx_o5"); val cRoot = tmp("mx_c5"); val mv = tmp("mx_mv5")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders5", "mx_cust5") {
        MaterializedView.createExact(sess, mv,
          "SELECT status, sum(cents) AS s FROM mx_orders5 " +
            "WHERE cents > 1000 GROUP BY status")
        val q = sess.sql("SELECT status, sum(cents) AS s FROM mx_orders5 " +
          "WHERE cents > 2000 GROUP BY status")
        assert(!usesMv(q, mv), "different filter constant must not match")
      }
    }
  }

  test("attachExact restores a persisted exact view after a registry wipe") {
    val oRoot = tmp("mx_o6"); val cRoot = tmp("mx_c6"); val mv = tmp("mx_mv6")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders6", "mx_cust6") {
        val defSql = "SELECT status, sum(cents) AS s FROM mx_orders6 " +
          "GROUP BY status"
        MaterializedView.createExact(sess, mv, defSql)
        // wipe registry AND discovery markers (lost catalog): the
        // explicit attachExact API is the restore path under test
        MaterializedView.clearRegistry()
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(oRoot, "_mv_registry"))
        assert(!usesMv(sess.sql(defSql), mv))
        val spec = MaterializedView.attachExact(sess, mv)
        assert(spec.sql == defSql)
        assert(usesMv(sess.sql(defSql), mv))
      }
    }
  }

  test("DROP MATERIALIZED VIEW deregisters; the table survives for re-attach") {
    val oRoot = tmp("mx_o8"); val cRoot = tmp("mx_c8"); val mv = tmp("mx_mv8")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders8", "mx_cust8") {
        val defSql = "SELECT status, sum(cents) AS s FROM mx_orders8 " +
          "GROUP BY status"
        MaterializedView.createExact(sess, mv, defSql)
        assert(usesMv(sess.sql(defSql), mv))
        sess.sql(s"DROP MATERIALIZED VIEW gvt.`$mv`").collect()
        assert(!usesMv(sess.sql(defSql), mv), "dropped view must not serve")
        MaterializedView.attachExact(sess, mv) // table intact on disk
        assert(usesMv(sess.sql(defSql), mv))
        MaterializedView.drop(mv)
      }
    }
  }

  test("semantic relation equality lets CacheManager serve a second independent gvt read") {
    val oRoot = tmp("mx_o9"); val cRoot = tmp("mx_c9")
    mkBases(oRoot, cRoot)
    val a = spark.read.format("gvt").load(oRoot).groupBy("status")
      .agg(sum("cents").as("s"))
    a.cache()
    try {
      a.collect()
      // a SEPARATELY-built identical read must plan onto the cache
      val b = spark.read.format("gvt").load(oRoot).groupBy("status")
        .agg(sum("cents").as("s"))
      assert(b.queryExecution.withCachedData.toString
        .contains("InMemoryRelation"),
        b.queryExecution.withCachedData.toString)
      // a new commit changes the chain → the cache must NOT serve
      VersionedTable.append(spark.range(1).select(lit(880000L).as("k"),
        lit(0L).as("ck"), lit("O").as("status"), lit(5L).as("cents")), oRoot)
      val c = spark.read.format("gvt").load(oRoot).groupBy("status")
        .agg(sum("cents").as("s"))
      assert(!c.queryExecution.withCachedData.toString
        .contains("InMemoryRelation"),
        "advanced base must not read the stale cache")
    } finally a.unpersist()
  }

  test("differential join refresh: append-only deltas fold without recomputing A⋈B") {
    val oRoot = tmp("mx_o10"); val cRoot = tmp("mx_c10"); val mv = tmp("mx_mv10")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders10", "mx_cust10") {
        val defSql =
          """SELECT segment, status, sum(cents) AS sum_cents, count(*) AS n
            |FROM mx_orders10 JOIN mx_cust10 ON ck = ck2
            |GROUP BY segment, status""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        // appends on BOTH sides: new orders for existing customers, a
        // new customer segment, and orders landing on the new customer
        VersionedTable.append(sess.range(10).select(
          (col("id") + 700000).as("k"), (col("id") % 5).as("ck"),
          lit("F").as("status"), lit(100L).as("cents")), oRoot)
        VersionedTable.append(sess.range(1).select(
          lit(777777L).as("ck2"), lit("NEWSEG").as("segment")), cRoot)
        VersionedTable.append(sess.range(3).select(
          (col("id") + 710000).as("k"), lit(777777L).as("ck"),
          lit("O").as("status"), lit(9L).as("cents")), oRoot)
        MaterializedView.refresh(sess, mv)
        // maintenance was the differential fold, not a re-run
        val ops = VersionedTable.history(sess, mv)
          .select("operation").collect().map(_.getString(0)).toSet
        assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"), ops)
        // correctness: equals a from-scratch join-aggregate
        val exp = sess.read.format("gvt").load(oRoot)
          .join(sess.read.format("gvt").load(cRoot), col("ck") === col("ck2"))
          .groupBy("segment", "status")
          .agg(sum("cents").as("s"), count(lit(1)).as("c"))
          .collect().map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
        val got = VersionedTable.readLatest(sess, mv)
          .select("segment", "status", "sum_cents", "n")
          .collect().map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
        assert(got == exp)
        assert(got.contains(("NEWSEG", "O")), "cross-delta rows must appear")
        // and the refreshed view serves the live query again
        sess.read.format("gvt").load(oRoot)
          .createOrReplaceTempView("mx_orders10")
        sess.read.format("gvt").load(cRoot)
          .createOrReplaceTempView("mx_cust10")
        assert(usesMv(sess.sql(defSql), mv))
        MaterializedView.drop(mv)
      }
    }
  }

  test("3-way differential refresh: telescoping delta terms over fact and two dims") {
    val oRoot = tmp("mx_o12"); val cRoot = tmp("mx_c12")
    val nRoot = tmp("mx_n12"); val mv = tmp("mx_mv12")
    mkBases(oRoot, cRoot)
    // second dim: a "region" derived from the customer key space
    VersionedTable.write(spark.range(8).select(col("id").as("rk"),
      concat(lit("R"), col("id")).as("rname")), nRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders12", "mx_cust12") {
        sess.read.format("gvt").load(nRoot)
          .createOrReplaceTempView("mx_reg12")
        val defSql =
          """SELECT rname, segment, sum(cents) AS sum_cents, count(*) AS n
            |FROM mx_orders12 JOIN mx_cust12 ON ck = ck2
            |  JOIN mx_reg12 ON ck2 % 8 = rk
            |GROUP BY rname, segment""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        assert(MaterializedView.exactViews
          .exists(e => e.spec.mvRoot == mv && e.joinAgg.exists(_.rels.size == 3)),
          "3-way shape must recognize for differential maintenance")
        // deltas on ALL THREE bases
        VersionedTable.append(sess.range(6).select(
          (col("id") + 800000).as("k"), (col("id") % 3).as("ck"),
          lit("F").as("status"), lit(55L).as("cents")), oRoot)
        VersionedTable.append(sess.range(1).select(lit(888888L).as("ck2"),
          lit("SEG12").as("segment")), cRoot)
        VersionedTable.append(sess.range(2).select((col("id") + 8).as("rk"),
          concat(lit("R"), col("id") + 8).as("rname")), nRoot)
        VersionedTable.append(sess.range(2).select(
          (col("id") + 810000).as("k"), lit(888888L).as("ck"),
          lit("O").as("status"), lit(7L).as("cents")), oRoot)
        MaterializedView.refresh(sess, mv)
        val ops = VersionedTable.history(sess, mv)
          .select("operation").collect().map(_.getString(0)).toSet
        assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"), ops)
        val direct = sess.read.format("gvt").load(oRoot)
          .join(sess.read.format("gvt").load(cRoot), col("ck") === col("ck2"))
          .join(sess.read.format("gvt").load(nRoot), col("ck2") % 8 === col("rk"))
          .groupBy("rname", "segment")
          .agg(sum("cents").as("s"), count(lit(1)).as("c"))
          .collect().map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
        val got = VersionedTable.readLatest(sess, mv)
          .select("rname", "segment", "sum_cents", "n")
          .collect().map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
        assert(got == direct)
        // 888888 % 8 = 0 → the new customer's orders land in R0/SEG12
        assert(got.contains(("R0", "SEG12")), got.keys.toSeq.sorted.mkString(","))
        MaterializedView.drop(mv)
      }
    }
  }

  test("counting-IVM retractions: a DELETE through a sum/count join " +
    "view folds differentially — the fact base is never rescanned") {
    val oRoot = tmp("mx_o11"); val cRoot = tmp("mx_c11"); val mv = tmp("mx_mv11")
    mkBases(oRoot, cRoot)
    // CDF sidecars: the DML commit persists its change rows, so the
    // refresh delta is O(changed) rows, not O(touched files)
    VersionedTable.setTblProperties(oRoot,
      Map("gvt.enableChangeDataFeed" -> "true"))
    val oRows = spark.read.format("gvt").load(oRoot).count()
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders11", "mx_cust11") {
        val defSql =
          """SELECT segment, sum(cents) AS sum_cents, count(*) AS n
            |FROM mx_orders11 JOIN mx_cust11 ON ck = ck2
            |GROUP BY segment""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        // mixed range on the FACT: a retraction hop plus an append hop
        // (a dim-side delta would legitimately read the full fact in
        // its o_old ⋈ Δc term — the records bound below pins the FACT
        // delta path, the 100 TB side)
        VersionedTable.deleteWhereVector(sess, oRoot, col("k") % 50 === 0)
        VersionedTable.append(sess.range(10).select(
          (col("id") + 990000).as("k"), (col("id") % 7).as("ck"),
          lit("R").as("status"), lit(33L).as("cents")), oRoot)
        // count every record any refresh job reads: a rebuild rescans
        // the fact base; the signed fold reads only Δ⁻ ⋈ dims + MV
        val recordsRead = new java.util.concurrent.atomic.AtomicLong(0L)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            recordsRead.addAndGet(e.taskMetrics.inputMetrics.recordsRead); ()
          }
        }
        sess.sparkContext.addSparkListener(listener)
        try {
          MaterializedView.refresh(sess, mv)
          org.apache.spark.sql.graft.NativeColumns.drainListenerBus(sess)
        } finally sess.sparkContext.removeSparkListener(listener)
        val ops = VersionedTable.history(sess, mv)
          .select("operation").collect().map(_.getString(0)).toSet
        assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
          s"a retraction must fold, not rebuild: $ops")
        assert(recordsRead.get() < oRows / 2,
          s"retraction refresh read ${recordsRead.get()} records — " +
            s"O(base)=$oRows would mean the fact base was rescanned")
        val exp = sess.read.format("gvt").load(oRoot)
          .join(sess.read.format("gvt").load(cRoot), col("ck") === col("ck2"))
          .groupBy("segment")
          .agg(sum("cents").as("s"), count(lit(1)).as("c"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        val got = VersionedTable.readLatest(sess, mv)
          .select("segment", "sum_cents", "n")
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        assert(got == exp)
        // the refreshed view serves the live query again
        sess.read.format("gvt").load(oRoot)
          .createOrReplaceTempView("mx_orders11")
        sess.read.format("gvt").load(cRoot)
          .createOrReplaceTempView("mx_cust11")
        assert(usesMv(sess.sql(defSql), mv))
        MaterializedView.drop(mv)
      }
    }
  }

  test("retractions that empty a group drop its MV row; a pure-delete " +
    "range folds (negated) without a positive term") {
    val oRoot = tmp("mx_o13"); val cRoot = tmp("mx_c13"); val mv = tmp("mx_mv13")
    // tiny controlled bases: two segments, one fully deleted
    VersionedTable.write(spark.range(10).select(col("id").as("k"),
      (col("id") % 2).as("ck"), (col("id") * 100 + 1).as("cents")), oRoot)
    VersionedTable.write(spark.range(2).select(col("id").as("ck2"),
      concat(lit("S"), col("id")).as("segment")), cRoot)
    GraftSession.withExtensions(spark) { sess =>
      sess.read.format("gvt").load(oRoot).createOrReplaceTempView("mx_o13")
      sess.read.format("gvt").load(cRoot).createOrReplaceTempView("mx_c13")
      val defSql =
        """SELECT segment, sum(cents) AS sum_cents, count(*) AS n
          |FROM mx_o13 JOIN mx_c13 ON ck = ck2
          |GROUP BY segment""".stripMargin
      MaterializedView.createExact(sess, mv, defSql)
      // delete EVERY S1 order (ck=1 ⇔ odd k) — that group must vanish
      VersionedTable.deleteWhereVector(sess, oRoot, col("k") % 2 === 1)
      MaterializedView.refresh(sess, mv)
      val ops = VersionedTable.history(sess, mv)
        .select("operation").collect().map(_.getString(0)).toSet
      assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"), ops)
      val got = VersionedTable.readLatest(sess, mv)
        .select("segment", "sum_cents", "n")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got == Map("S0" -> ((0L + 200 + 400 + 600 + 800 + 5), 5L)),
        got.toString)
      MaterializedView.drop(mv)
    }
  }

  test("fused signed fold: a mixed retraction range folds in ONE " +
    "aggregate pass and keeps the defining sum's TYPE (double)") {
    val oRoot = tmp("mx_o17"); val cRoot = tmp("mx_c17"); val mv = tmp("mx_mv17")
    // exactly-representable doubles (multiples of 0.25) keep the signed
    // sum bit-exact against the recompute
    VersionedTable.write(spark.range(12).select(col("id").as("k"),
      (col("id") % 2).as("ck"),
      (col("id").cast("double") * 0.25).as("amt")), oRoot)
    VersionedTable.write(spark.range(2).select(col("id").as("ck2"),
      concat(lit("S"), col("id")).as("segment")), cRoot)
    VersionedTable.setTblProperties(oRoot,
      Map("gvt.enableChangeDataFeed" -> "true"))
    GraftSession.withExtensions(spark) { sess =>
      sess.read.format("gvt").load(oRoot).createOrReplaceTempView("mx_o17")
      sess.read.format("gvt").load(cRoot).createOrReplaceTempView("mx_c17")
      val defSql =
        """SELECT segment, sum(amt) AS sum_amt, count(amt) AS n_amt,
          |count(*) AS n
          |FROM mx_o17 JOIN mx_c17 ON ck = ck2
          |GROUP BY segment""".stripMargin
      MaterializedView.createExact(sess, mv, defSql)
      val createdType = VersionedTable.readLatest(sess, mv)
        .schema("sum_amt").dataType
      // BOTH classes in one range: a delete hop plus an append hop —
      // the fused path aggregates Δ⁺ and Δ⁻ together, signed
      VersionedTable.deleteWhereVector(sess, oRoot, col("k") % 3 === 0)
      VersionedTable.append(sess.range(2).select((col("id") + 100).as("k"),
        (col("id") % 2).as("ck"),
        (col("id").cast("double") * 0.25 + 0.5).as("amt")), oRoot)
      MaterializedView.refresh(sess, mv)
      val ops = VersionedTable.history(sess, mv)
        .select("operation").collect().map(_.getString(0)).toSet
      assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"), ops)
      val live = VersionedTable.readLatest(sess, mv)
      assert(live.schema("sum_amt").dataType == createdType,
        s"signed fold changed the sum type: ${live.schema("sum_amt")}")
      val exp = sess.read.format("gvt").load(oRoot)
        .join(sess.read.format("gvt").load(cRoot), col("ck") === col("ck2"))
        .groupBy("segment")
        .agg(sum("amt").as("s"), count(col("amt")).as("na"),
          count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
      val got = live.select("segment", "sum_amt", "n_amt", "n")
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == exp, s"got=$got exp=$exp")
      MaterializedView.drop(mv)
    }
  }

  test("a min/max join view REFRESHES on retraction via the " +
    "affected-group recompute — never a whole-view rebuild") {
    val oRoot = tmp("mx_o14"); val cRoot = tmp("mx_c14"); val mv = tmp("mx_mv14")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders14", "mx_cust14") {
        val defSql =
          """SELECT segment, max(cents) AS max_cents
            |FROM mx_orders14 JOIN mx_cust14 ON ck = ck2
            |GROUP BY segment""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        VersionedTable.deleteWhereVector(sess, oRoot, col("k") % 5 === 0)
        MaterializedView.refresh(sess, mv)
        val ops = VersionedTable.history(sess, mv)
          .select("operation").collect().map(_.getString(0)).toSet
        assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
          s"min/max retraction must recompute only the affected " +
            s"groups, not rebuild the view: $ops")
        val exp = sess.read.format("gvt").load(oRoot)
          .join(sess.read.format("gvt").load(cRoot), col("ck") === col("ck2"))
          .groupBy("segment").agg(max("cents").as("m"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val got = VersionedTable.readLatest(sess, mv)
          .select("segment", "max_cents")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == exp)
        // the refreshed view must still serve the defining shape
        sess.read.format("gvt").load(oRoot)
          .createOrReplaceTempView("mx_orders14")
        sess.read.format("gvt").load(cRoot)
          .createOrReplaceTempView("mx_cust14")
        assert(usesMv(sess.sql(defSql), mv))
        MaterializedView.drop(mv)
      }
    }
  }

  test("count(DISTINCT) through a JOIN view maintains DIFFERENTIALLY " +
    "via the multiplicity side table — inserts AND deletes, no " +
    "rebuild, values exact") {
    val oRoot = tmp("mx_o19"); val cRoot = tmp("mx_c19"); val mv = tmp("mx_mv19")
    // controlled fixture: fact (k, ck, v), dim (ck2, segment)
    VersionedTable.write(spark.range(60).select(col("id").as("k"),
      (col("id") % 6).as("ck"), (col("id") % 9).as("v")), oRoot)
    VersionedTable.write(spark.range(6).select(col("id").as("ck2"),
      concat(lit("s"), col("id") % 2).as("segment")), cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_o19_t", "mx_c19_t") {
        val defSql =
          """SELECT segment, count(DISTINCT v) AS uv,
            |       sum(v) AS sv, count(*) AS n
            |FROM mx_o19_t JOIN mx_c19_t ON ck = ck2
            |GROUP BY segment""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        assert(MaterializedView.exactViews.exists(e =>
          e.spec.mvRoot == mv && e.joinAgg.isDefined),
          "a distinct-counting join view must carry the differential " +
            "shape now")
        // delete every v=4 row (the value disappears from its
        // segments) and append rows carrying a brand-new value 77
        VersionedTable.deleteWhereVector(sess, oRoot, col("v") === 4)
        VersionedTable.append(spark.range(3).select(
          (col("id") + 900).as("k"), (col("id") % 6).as("ck"),
          lit(77L).as("v")), oRoot)
        MaterializedView.refresh(sess, mv)
        val ops = VersionedTable.history(sess, mv)
          .select("operation").collect().map(_.getString(0)).toSet
        assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
          s"distinct join-view maintenance must stay differential: $ops")
        val exp = sess.read.format("gvt").load(oRoot)
          .join(sess.read.format("gvt").load(cRoot),
            col("ck") === col("ck2"))
          .groupBy("segment")
          .agg(countDistinct(col("v")).as("uv"), sum("v").as("sv"),
            count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        val got = VersionedTable.readLatest(sess, mv)
          .select("segment", "uv", "sv", "n")
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        assert(got == exp, s"expected $exp")
        // the side table equals a fresh per-(segment, v) recount
        val side = MaterializedView.sideRootOf(mv, "uv")
        val sideExp = sess.read.format("gvt").load(oRoot)
          .join(sess.read.format("gvt").load(cRoot),
            col("ck") === col("ck2"))
          .groupBy("segment", "v").agg(count(lit(1)).as("m"))
          .collect().map(r => (r.getString(0), r.getLong(1)) ->
            r.getLong(2)).toMap
        val sideGot = VersionedTable.readLatest(sess, side)
          .collect().map(r => (r.getString(0), r.getLong(1)) ->
            r.getLong(2)).toMap
        assert(sideGot == sideExp)
        // the refreshed view serves the defining shape again
        sess.read.format("gvt").load(oRoot)
          .createOrReplaceTempView("mx_o19_t")
        sess.read.format("gvt").load(cRoot)
          .createOrReplaceTempView("mx_c19_t")
        assert(usesMv(sess.sql(defSql), mv))
        // a DISTINCT rollup (grouping dropped entirely) serves from
        // the SIDE table alone — distinct values re-aggregate at any
        // subset where distinct counts cannot; the join is untouched
        val qd = sess.sql(
          """SELECT count(DISTINCT v) AS u, count(v) AS c
            |FROM mx_o19_t JOIN mx_c19_t ON ck = ck2""".stripMargin)
        assert(usesMv(qd, side),
          "distinct rollup must re-aggregate the side table:\n" +
            qd.queryExecution.optimizedPlan)
        assert(!TestSpark.scansUnder(qd, oRoot) &&
          !TestSpark.scansUnder(qd, cRoot),
          "side-served rollup must not recompute the join")
        val expD = sess.read.format("gvt").load(oRoot)
          .join(sess.read.format("gvt").load(cRoot),
            col("ck") === col("ck2"))
          .agg(countDistinct(col("v")).as("u"), count(col("v")).as("c"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).head
        assert(qd.collect().map(r => (r.getLong(0), r.getLong(1))).head
          == expD)
        // a filter on a group column compensates on the side rows
        val qf = sess.sql(
          """SELECT count(DISTINCT v) AS u
            |FROM mx_o19_t JOIN mx_c19_t ON ck = ck2
            |WHERE segment = 's1'""".stripMargin)
        assert(usesMv(qf, side), qf.queryExecution.optimizedPlan.toString)
        val expF = sess.read.format("gvt").load(oRoot)
          .join(sess.read.format("gvt").load(cRoot),
            col("ck") === col("ck2"))
          .filter(col("segment") === "s1")
          .agg(countDistinct(col("v"))).collect().head.getLong(0)
        assert(qf.collect().head.getLong(0) == expF)
        // MIXED distinct + sum rollups fail closed to the join
        val qm = sess.sql(
          """SELECT count(DISTINCT v) AS u, sum(v) AS s
            |FROM mx_o19_t JOIN mx_c19_t ON ck = ck2""".stripMargin)
        assert(!usesMv(qm, side) && !usesMv(qm, mv),
          "mixed distinct rollups over a join view must fail closed")
        MaterializedView.drop(mv)
      }
    }
  }

  test("min/max join-view retraction: a mixed range (delete + append) " +
    "recomputes affected groups and folds the rest; fact-side group " +
    "columns keep the recompute fact-pruned") {
    val oRoot = tmp("mx_o16"); val cRoot = tmp("mx_c16"); val mv = tmp("mx_mv16")
    // fact with a FACT-SIDE group column (status): the recompute's IN
    // prefilter pushes to the fact scan itself
    VersionedTable.write(spark.range(5000).select(col("id").as("k"),
      (col("id") % 40).as("ck"),
      concat(lit("s"), col("id") % 25).as("status"),
      (col("id") * 13 % 9999).as("cents")), oRoot)
    VersionedTable.write(spark.range(40).select(col("id").as("ck2"),
      concat(lit("seg"), col("id") % 4).as("segment")), cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_orders16", "mx_cust16") {
        val defSql =
          """SELECT status, min(cents) AS mn, max(cents) AS mx,
            |       count(*) AS c
            |FROM mx_orders16 JOIN mx_cust16 ON ck = ck2
            |GROUP BY status""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        // retraction confined to status s7; appends land in s3
        VersionedTable.deleteWhereVector(sess, oRoot,
          col("status") === "s7" && col("cents") % 2 === 0)
        VersionedTable.append(sess.range(9).select(
          (col("id") + 900000).as("k"), (col("id") % 40).as("ck"),
          lit("s3").as("status"), (col("id") + 20000).as("cents")), oRoot)
        MaterializedView.refresh(sess, mv)
        val ops = VersionedTable.history(sess, mv)
          .select("operation").collect().map(_.getString(0)).toSet
        assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
          ops)
        val exp = sess.read.format("gvt").load(oRoot)
          .join(sess.read.format("gvt").load(cRoot),
            col("ck") === col("ck2"))
          .groupBy("status")
          .agg(min("cents").as("mn"), max("cents").as("mx"),
            count(lit(1)).as("c"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        val got = VersionedTable.readLatest(sess, mv)
          .select("status", "mn", "mx", "c")
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        assert(got == exp)
        MaterializedView.drop(mv)
      }
    }
  }

  test("algebraic ROLLUP over a differential join view re-aggregates " +
    "the MV — subset grouping, avg/count from the counters, global agg") {
    val oRoot = tmp("mx_o15"); val cRoot = tmp("mx_c15"); val mv = tmp("mx_mv15")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_o15_t", "mx_c15_t") {
        val defSql =
          """SELECT segment, status, sum(cents) AS sum_cents, count(*) AS n
            |FROM mx_o15_t JOIN mx_c15_t ON ck = ck2
            |GROUP BY segment, status""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        val q = sess.sql(
          """SELECT segment, sum(cents) AS s, count(*) AS c,
            |  avg(cents) AS a
            |FROM mx_o15_t JOIN mx_c15_t ON ck = ck2
            |GROUP BY segment""".stripMargin)
        assert(usesMv(q, mv),
          "subset-grouping rollup must ride the join MV:\n" +
            q.queryExecution.optimizedPlan)
        val exp = spark.read.format("gvt").load(oRoot)
          .join(spark.read.format("gvt").load(cRoot), col("ck") === col("ck2"))
          .groupBy("segment")
          .agg(sum("cents").as("s"), count(lit(1)).as("c"),
            avg("cents").as("a"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
        val got = q.collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
        assert(got == exp)
        // the GLOBAL aggregate over the same join rides too
        val g = sess.sql(
          """SELECT sum(cents) AS s, count(*) AS c
            |FROM mx_o15_t JOIN mx_c15_t ON ck = ck2""".stripMargin)
        assert(usesMv(g, mv), g.queryExecution.optimizedPlan.toString)
        val gRow = g.collect().head
        assert((gRow.getLong(0), gRow.getLong(1)) ==
          (exp.values.map(_._1).sum, exp.values.map(_._2).sum))
        // a DIFFERENT aggregate input (min, undeclared) must NOT match
        val nm = sess.sql(
          """SELECT segment, min(cents) AS m
            |FROM mx_o15_t JOIN mx_c15_t ON ck = ck2
            |GROUP BY segment""".stripMargin)
        assert(!usesMv(nm, mv), "an undeclared aggregate must scan the join")
        MaterializedView.drop(mv)
      }
    }
  }

  test("rollup COMPENSATION: a filter on a group column (pushed below " +
    "the join by the optimizer) applies on the MV; non-group filters " +
    "and defining-side-only filters fail closed") {
    val oRoot = tmp("mx_o17"); val cRoot = tmp("mx_c17"); val mv = tmp("mx_mv17")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_o17_t", "mx_c17_t") {
        MaterializedView.createExact(sess, mv,
          """SELECT segment, status, sum(cents) AS sum_cents, count(*) AS n
            |FROM mx_o17_t JOIN mx_c17_t ON ck = ck2
            |GROUP BY segment, status""".stripMargin)
        // WHERE on a DIM group column + rollup to the other group —
        // the classic dashboard shape; Catalyst pushes the predicate
        // into the customer scan, so whole-subtree matching alone
        // cannot serve it
        val q = sess.sql(
          """SELECT status, sum(cents) AS s, count(*) AS c
            |FROM mx_o17_t JOIN mx_c17_t ON ck = ck2
            |WHERE segment = 'BUILDING'
            |GROUP BY status""".stripMargin)
        assert(usesMv(q, mv),
          "group-column filter must compensate on the MV:\n" +
            q.queryExecution.optimizedPlan)
        val exp = spark.read.format("gvt").load(oRoot)
          .join(spark.read.format("gvt").load(cRoot), col("ck") === col("ck2"))
          .filter(col("segment") === "BUILDING")
          .groupBy("status")
          .agg(sum("cents").as("s"), count(lit(1)).as("c"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        val got = q.collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(got == exp)
        // a FACT-side group-column filter compensates too
        val qf = sess.sql(
          """SELECT segment, sum(cents) AS s
            |FROM mx_o17_t JOIN mx_c17_t ON ck = ck2
            |WHERE status <> 'F'
            |GROUP BY segment""".stripMargin)
        assert(usesMv(qf, mv), qf.queryExecution.optimizedPlan.toString)
        // a NON-group-column filter must scan the join
        val qn = sess.sql(
          """SELECT status, sum(cents) AS s
            |FROM mx_o17_t JOIN mx_c17_t ON ck = ck2
            |WHERE cents > 100
            |GROUP BY status""".stripMargin)
        assert(!usesMv(qn, mv), "a data-column filter cannot compensate")
        // IN-lists and RANGES over group columns compensate too — the
        // next most common dashboard shapes after equality
        val qin = sess.sql(
          """SELECT status, sum(cents) AS s, count(*) AS c
            |FROM mx_o17_t JOIN mx_c17_t ON ck = ck2
            |WHERE segment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
            |GROUP BY status""".stripMargin)
        assert(usesMv(qin, mv),
          "IN-list on a group column must compensate on the MV:\n" +
            qin.queryExecution.optimizedPlan)
        val expIn = spark.read.format("gvt").load(oRoot)
          .join(spark.read.format("gvt").load(cRoot),
            col("ck") === col("ck2"))
          .filter(col("segment")
            .isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
          .groupBy("status")
          .agg(sum("cents").as("s"), count(lit(1)).as("c"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        assert(qin.collect().map(r =>
          r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap == expIn)
        val qrange = sess.sql(
          """SELECT segment, sum(cents) AS s
            |FROM mx_o17_t JOIN mx_c17_t ON ck = ck2
            |WHERE status >= 'O' AND segment <> 'FURNITURE'
            |GROUP BY segment""".stripMargin)
        assert(usesMv(qrange, mv),
          "range + inequality on group columns must compensate:\n" +
            qrange.queryExecution.optimizedPlan)
        val expR = spark.read.format("gvt").load(oRoot)
          .join(spark.read.format("gvt").load(cRoot),
            col("ck") === col("ck2"))
          .filter(col("status") >= "O" && col("segment") =!= "FURNITURE")
          .groupBy("segment").agg(sum("cents").as("s"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(qrange.collect().map(r =>
          r.getString(0) -> r.getLong(1)).toMap == expR)
        MaterializedView.drop(mv)
      }
    }
  }

  test("rollup compensation fails closed when the VIEW filters and the " +
    "query does not (the MV is missing rows)") {
    val oRoot = tmp("mx_o18"); val cRoot = tmp("mx_c18"); val mv = tmp("mx_mv18")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_o18_t", "mx_c18_t") {
        MaterializedView.createExact(sess, mv,
          """SELECT segment, status, sum(cents) AS sum_cents
            |FROM mx_o18_t JOIN mx_c18_t ON ck = ck2
            |WHERE status = 'O'
            |GROUP BY segment, status""".stripMargin)
        val q = sess.sql(
          """SELECT segment, sum(cents) AS s
            |FROM mx_o18_t JOIN mx_c18_t ON ck = ck2
            |GROUP BY segment""".stripMargin)
        assert(!usesMv(q, mv),
          "an unfiltered rollup must not ride a filtered view")
        MaterializedView.drop(mv)
      }
    }
  }

  test("a registered join view never breaks unrelated aggregates over " +
    "evolved chains (the rollup matcher's strip is width-safe)") {
    val oRoot = tmp("mx_o16"); val cRoot = tmp("mx_c16"); val mv = tmp("mx_mv16")
    val evo = tmp("mx_evo16")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_o16_t", "mx_c16_t") {
        MaterializedView.createExact(sess, mv,
          """SELECT segment, sum(cents) AS sum_cents
            |FROM mx_o16_t JOIN mx_c16_t ON ck = ck2
            |GROUP BY segment""".stripMargin)
        // an EVOLVED chain: its read is a unionByName whose children
        // align through pruning/padding Projects — the rollup
        // matcher's strip must not dismantle them (the r15 bug failed
        // ANY such aggregate planned while a join view was registered)
        VersionedTable.write(spark.range(10)
          .select(col("id").as("a"), (col("id") * 2).as("b")), evo)
        VersionedTable.addColumns(sess, evo,
          Seq("c" -> org.apache.spark.sql.types.StringType))
        VersionedTable.append(sess.range(5).select(
          (col("id") + 100).as("a"), (col("id") * 3).as("b"),
          concat(lit("x"), col("id")).as("c")), evo)
        val agg = sess.read.format("gvt").load(evo)
          .agg(sum(col("a")).as("s"), count(lit(1)).as("n")).collect().head
        assert(agg.getLong(0) == (0 until 10).sum + (100 until 105).sum &&
          agg.getLong(1) == 15L)
        // a widened chain too (Cast-aligned union children)
        VersionedTable.widenColumnType(sess, evo, "b",
          org.apache.spark.sql.types.DoubleType)
        VersionedTable.append(sess.range(2).select(
          (col("id") + 200).as("a"), lit(0.5).as("b"),
          lit("y").as("c")), evo)
        assert(sess.read.format("gvt").load(evo).count() == 17)
        MaterializedView.drop(mv)
      }
    }
  }

  test("exact tier serves the PINNED MV snapshot — a newer out-of-band " +
    "MV commit is invisible until re-registration") {
    val oRoot = tmp("mx_opin"); val cRoot = tmp("mx_cpin"); val mv = tmp("mx_mvpin")
    mkBases(oRoot, cRoot)
    GraftSession.withExtensions(spark) { sess =>
      withViews(sess, oRoot, cRoot, "mx_opin_t", "mx_cpin_t") {
        val defSql =
          """SELECT segment, sum(cents) AS sum_cents
            |FROM mx_opin_t JOIN mx_cpin_t ON ck = ck2
            |GROUP BY segment""".stripMargin
        MaterializedView.createExact(sess, mv, defSql)
        val exp = sess.sql(defSql).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val junk = spark.read.format("gvt").load(mv)
          .withColumn("sum_cents", col("sum_cents") * 2)
        VersionedTable.write(junk, mv, operation = "MV_REFRESH")
        val q = sess.sql(defSql)
        assert(usesMv(q, mv), q.queryExecution.optimizedPlan.toString)
        val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == exp, "exact rewrite must read the registration's " +
          "pinned MV version, not whatever is latest on disk")
      }
    }
  }

  test("a defining query reading no gvt relation refuses (freshness unanchored)") {
    GraftSession.withExtensions(spark) { sess =>
      sess.read.parquet(s"$dir/orders.parquet")
        .createOrReplaceTempView("mx_plain")
      val e = intercept[IllegalArgumentException] {
        MaterializedView.createExact(sess, tmp("mx_mv7"),
          "SELECT o_orderstatus, count(*) AS n FROM mx_plain " +
            "GROUP BY o_orderstatus")
      }
      assert(e.getMessage.contains("no gvt relation"))
    }
  }
}
