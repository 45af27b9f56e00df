package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MaterializedView, VersionedTable}
import graft.sources.MaterializedView.AggSpec

/** Materialized-view rewrite + maintenance: freshness gating, rollup
  * re-aggregation, incremental refresh via the change feed (dead groups
  * drop, all-null sums stay NULL), the min/max rebuild trigger, avg
  * exactness, and the kill switch. Result correctness is asserted
  * against direct aggregation of the same snapshot; plan routing is
  * asserted on the optimized plan (MV path present / base path absent).
  */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private def cents(c: String) =
    floor(col(c) * 100 + lit(0.5)).cast("long")

  /** Fixture: orders as a gvt table with a long cents column. */
  private def mkBase(root: String): Unit = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        cents("o_totalprice").as("cents"))
    VersionedTable.write(o, root)
  }

  private def gvt(s: SparkSession, root: String): DataFrame =
    s.read.format("gvt").load(root)

  private def usesMv(df: DataFrame, mvRoot: String): Boolean =
    TestSpark.scansUnder(df, mvRoot)

  test("fresh MV answers the aggregate; result identical to the base scan") {
    val base = tmp("mv_base"); val mv = tmp("mv_view")
    mkBase(base)
    MaterializedView.create(spark, base, mv,
      Seq("o_orderstatus", "o_orderpriority"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n_orders")))
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base).groupBy("o_orderstatus", "o_orderpriority")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"))
      assert(usesMv(q, mv), q.queryExecution.optimizedPlan.toString)
      val direct = gvt(sess, base).groupBy("o_orderstatus", "o_orderpriority")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"))
        .withColumn("__off", lit(1)) // breaks the rewrite match shape? no:
      // compute the expected values OUTSIDE the extensions session so no
      // rewrite can touch them
      val exp = spark.read.format("gvt").load(base)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val got = q.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
      assert(got == exp)
      val _ = direct
    }
  }

  test("rollup to a grouping subset + filter on a group column rides the MV") {
    val base = tmp("mv_base2"); val mv = tmp("mv_view2")
    mkBase(base)
    MaterializedView.create(spark, base, mv,
      Seq("o_orderstatus", "o_orderpriority"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n_orders")))
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"), avg("cents").as("a"))
      assert(usesMv(q, mv), q.queryExecution.optimizedPlan.toString)
      val exp = spark.read.format("gvt").load(base)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"), avg("cents").as("a"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      val got = q.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(got == exp) // avg must be EXACT: total sum / total count
    }
  }

  test("global aggregate over a filtered-out group returns count 0 via the MV") {
    val base = tmp("mv_base3"); val mv = tmp("mv_view3")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("count", "*", "n")))
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base).filter(col("o_orderstatus") === "ZZ")
        .agg(count(lit(1)).as("c"))
      assert(usesMv(q, mv))
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(0L))
    }
  }

  test("stale MV degrades to the base scan; refresh restores the rewrite") {
    val base = tmp("mv_base4"); val mv = tmp("mv_view4")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n_orders")))
    // new commit → MV stale
    val extra = spark.range(3).select(
      (col("id") + 1000000).as("o_orderkey"), lit("X").as("o_orderstatus"),
      lit("1-URGENT").as("o_orderpriority"), lit(12345L).as("cents"))
    VersionedTable.append(extra, base)
    GraftSession.withExtensions(spark) { sess =>
      def q = gvt(sess, base).groupBy("o_orderstatus")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"))
      assert(!usesMv(q, mv), "stale MV must not serve the query")
      MaterializedView.refresh(sess, mv)
      assert(usesMv(q, mv), "refreshed MV must serve the query again")
      val got = q.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
      assert(got("X") == (3 * 12345L, 3L))
    }
  }

  test("incremental refresh folds deletes exactly; emptied groups drop out") {
    val base = tmp("mv_base5"); val mv = tmp("mv_view5")
    mkBase(base)
    // the keyless change feed serves DML hops only when captured at
    // commit time — the MV-over-CDF contract (Delta MVs require the same)
    VersionedTable.setTblProperties(base,
      Map("gvt.enableChangeDataFeed" -> "true"))
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n_orders")))
    // delete ALL of one status (group must vanish) + some of another
    VersionedTable.deleteWhereVector(spark, base, col("o_orderstatus") === "P")
    VersionedTable.deleteWhereVector(spark, base,
      col("o_orderstatus") === "F" && col("o_orderkey") % 3 === 0)
    MaterializedView.refresh(spark, mv)
    // the refresh was incremental, not a rebuild
    val ops = VersionedTable.history(spark, mv)
      .select("operation").collect().map(_.getString(0)).toSet
    assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"), ops)
    val exp = VersionedTable.readLatest(spark, base)
      .groupBy("o_orderstatus")
      .agg(sum("cents").as("s"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mvRows = VersionedTable.readLatest(spark, mv)
      .select("o_orderstatus", "sum_cents", "n_orders")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mvRows == exp)
    assert(!mvRows.contains("P"), "emptied group must drop from the MV")
  }

  test("min/max over a row-removing range recomputes ONLY the " +
    "retraction-affected groups — refresh, not rebuild, and right") {
    val base = tmp("mv_base6"); val mv = tmp("mv_view6")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("min", "cents", "min_cents"),
        AggSpec("max", "cents", "max_cents")))
    // delete the rows carrying extremes: max overall
    val top = VersionedTable.readLatest(spark, base)
      .orderBy(col("cents").desc).limit(5)
      .select("o_orderkey").collect().map(_.getLong(0))
    VersionedTable.deleteWhereVector(spark, base,
      col("o_orderkey").isin(top.toSeq: _*))
    MaterializedView.refresh(spark, mv)
    val ops = VersionedTable.history(spark, mv)
      .select("operation").collect().map(_.getString(0)).toSet
    assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
      s"a retraction under min/max must take the affected-group " +
        s"recompute, not a full rebuild: $ops")
    val exp = VersionedTable.readLatest(spark, base).groupBy("o_orderstatus")
      .agg(min("cents").as("mn"), max("cents").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = VersionedTable.readLatest(spark, mv)
      .select("o_orderstatus", "min_cents", "max_cents")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exp)
  }

  test("min/max retraction refresh reads the base proportionally to " +
    "the AFFECTED groups (partition-pruned), not O(base)") {
    val base = tmp("mv_base20"); val mv = tmp("mv_view20")
    // 50 partitions of 1k rows: the affected-group recompute's IN
    // prefilter must prune the 49 untouched partitions statically
    val n = 50000L
    VersionedTable.write(spark.range(n).select(col("id").as("k"),
      concat(lit("g"), col("id") % 50).as("g"),
      (col("id") * 7 % 100000).as("v")), base,
      partitionBy = Seq("g"))
    MaterializedView.create(spark, base, mv, Seq("g"),
      Seq(AggSpec("min", "v", "mn"), AggSpec("max", "v", "mx"),
        AggSpec("count", "*", "c")))
    // delete SOME rows of one group and append rows to another: the
    // recompute touches only partition g7; g3 folds incrementally
    VersionedTable.deleteWhereVector(spark, base,
      col("g") === "g7" && col("v") % 3 === 0)
    VersionedTable.append(spark.range(7).select(
      (col("id") + 3000000).as("k"), lit("g3").as("g"),
      (col("id") + 5).as("v")), base)
    val recordsRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        recordsRead.addAndGet(e.taskMetrics.inputMetrics.recordsRead); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      MaterializedView.refresh(spark, mv)
      org.apache.spark.sql.graft.NativeColumns.drainListenerBus(spark)
    } finally spark.sparkContext.removeSparkListener(listener)
    val ops = VersionedTable.history(spark, mv)
      .select("operation").collect().map(_.getString(0)).toSet
    assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"), ops)
    // bound: delta rows (≤1k) + the g7 partition (1k) + MV rows (50)
    // — a rebuild (or an unpruned recompute) reads all 50k
    assert(recordsRead.get() < n / 10,
      s"affected-group refresh read ${recordsRead.get()} records of a " +
        s"$n-row base whose affected partition holds 1000 — the " +
        "recompute was not pruned to the affected groups")
    val exp = VersionedTable.readLatest(spark, base).groupBy("g")
      .agg(min("v").as("mn"), max("v").as("mx"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = VersionedTable.readLatest(spark, mv)
      .select("g", "mn", "mx", "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == exp)
  }

  test("a min/max group fully deleted drops from the MV via the " +
    "affected-group recompute") {
    val base = tmp("mv_base21"); val mv = tmp("mv_view21")
    VersionedTable.write(spark.range(20).select(col("id").as("k"),
      when(col("id") < 10, "A").otherwise("B").as("g"),
      (col("id") * 3 + 1).as("v")), base)
    MaterializedView.create(spark, base, mv, Seq("g"),
      Seq(AggSpec("min", "v", "mn"), AggSpec("max", "v", "mx")))
    VersionedTable.deleteWhereVector(spark, base, col("g") === "A")
    MaterializedView.refresh(spark, mv)
    val ops = VersionedTable.history(spark, mv)
      .select("operation").collect().map(_.getString(0)).toSet
    assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"), ops)
    val rows = VersionedTable.readLatest(spark, mv)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows == Map("B" -> (31L, 58L)),
      s"emptied group A must drop; B untouched: $rows")
  }

  test("min/max over pure appends refreshes incrementally") {
    val base = tmp("mv_base7"); val mv = tmp("mv_view7")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("min", "cents", "min_cents"),
        AggSpec("max", "cents", "max_cents"),
        AggSpec("count", "*", "n")))
    val extra = spark.range(2).select(
      (col("id") + 2000000).as("o_orderkey"), lit("F").as("o_orderstatus"),
      lit("2-HIGH").as("o_orderpriority"),
      (col("id") * 100000000L + 1).as("cents")) // new global max
    VersionedTable.append(extra, base)
    MaterializedView.refresh(spark, mv)
    val ops = VersionedTable.history(spark, mv)
      .select("operation").collect().map(_.getString(0)).toSet
    assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"), ops)
    val exp = VersionedTable.readLatest(spark, base).groupBy("o_orderstatus")
      .agg(min("cents").as("mn"), max("cents").as("mx"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = VersionedTable.readLatest(spark, mv)
      .select("o_orderstatus", "min_cents", "max_cents", "n")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == exp)
  }

  test("count_distinct MV: exact grouping serves from the MV column; " +
    "a SUBSET rollup re-aggregates the multiplicity side table") {
    val base = tmp("mv_base22"); val mv = tmp("mv_view22")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        col("o_orderstatus").as("status"), col("o_orderpriority").as("prio"),
        cents("o_totalprice").as("cents"))
    VersionedTable.write(o, base)
    MaterializedView.create(spark, base, mv, Seq("status", "prio"),
      Seq(AggSpec("count_distinct", "ck", "u_cust"),
        AggSpec("sum", "cents", "sum_cents")))
    val sideRoot = MaterializedView.sideRootOf(mv, "u_cust")
    GraftSession.withExtensions(spark) { sess =>
      // exact grouping: the declared column answers straight off the MV
      val q1 = gvt(sess, base).groupBy("status", "prio")
        .agg(countDistinct(col("ck")).as("u"), sum("cents").as("s"))
      assert(usesMv(q1, mv), q1.queryExecution.optimizedPlan.toString)
      val exp1 = spark.read.format("gvt").load(base)
        .groupBy("status", "prio")
        .agg(countDistinct(col("ck")).as("u"), sum("cents").as("s"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val got1 = q1.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
      assert(got1 == exp1)
      // SUBSET rollup: distinct counts cannot re-aggregate, so the
      // query must scan the SIDE table (and only it)
      val q2 = gvt(sess, base).groupBy("status")
        .agg(countDistinct(col("ck")).as("u"))
      assert(usesMv(q2, sideRoot),
        "subset distinct rollup must scan the side table:\n" +
          q2.queryExecution.optimizedPlan)
      assert(!TestSpark.scansUnder(q2, base),
        "side-served rollup must not touch the base")
      val exp2 = spark.read.format("gvt").load(base).groupBy("status")
        .agg(countDistinct(col("ck")).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(q2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == exp2)
      // global distinct + a filter on a group column compensates on
      // side rows; count(ck) rides the summed multiplicities
      val q3 = gvt(sess, base).filter(col("status") =!= "F")
        .agg(countDistinct(col("ck")).as("u"), count(col("ck")).as("c"))
      assert(usesMv(q3, sideRoot), q3.queryExecution.optimizedPlan.toString)
      val exp3 = spark.read.format("gvt").load(base)
        .filter(col("status") =!= "F")
        .agg(countDistinct(col("ck")).as("u"), count(col("ck")).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).head
      assert(q3.collect().map(r => (r.getLong(0), r.getLong(1))).head
        == exp3)
    }
  }

  test("MIXED distinct + re-aggregable aggregates at a subset " +
    "grouping: the MV re-aggregation LEFT-joins the side table — no " +
    "base scan, exact values incl. avg scaffolding") {
    val base = tmp("mv_base24"); val mv = tmp("mv_view24")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        col("o_orderstatus").as("status"), col("o_orderpriority").as("prio"),
        cents("o_totalprice").as("cents"))
    VersionedTable.write(o, base)
    MaterializedView.create(spark, base, mv, Seq("status", "prio"),
      Seq(AggSpec("count_distinct", "ck", "u_cust"),
        AggSpec("sum", "cents", "sum_cents")))
    val sideRoot = MaterializedView.sideRootOf(mv, "u_cust")
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base)
        .filter(col("prio") =!= "4-NOT SPECIFIED")
        .groupBy("status")
        .agg(sum("cents").as("s"), countDistinct(col("ck")).as("u"),
          count(lit(1)).as("n"), avg(col("cents")).as("a"))
      assert(usesMv(q, mv) && usesMv(q, sideRoot),
        "mixed rollup must read MV AND side table:\n" +
          q.queryExecution.optimizedPlan)
      assert(!TestSpark.scansUnder(q, base),
        "mixed rollup must not touch the base")
      val exp = spark.read.format("gvt").load(base)
        .filter(col("prio") =!= "4-NOT SPECIFIED")
        .groupBy("status")
        .agg(sum("cents").as("s"), countDistinct(col("ck")).as("u"),
          count(lit(1)).as("n"), avg(col("cents")).as("a"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      val got = q.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      assert(got == exp)
      // GLOBAL mixed aggregate (no grouping): 1-row ⋈ 1-row join
      val qg = gvt(sess, base)
        .agg(countDistinct(col("ck")).as("u"), sum("cents").as("s"))
      assert(usesMv(qg, mv) && usesMv(qg, sideRoot),
        qg.queryExecution.optimizedPlan.toString)
      val eg = spark.read.format("gvt").load(base)
        .agg(countDistinct(col("ck")).as("u"), sum("cents").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).head
      assert(qg.collect().map(r => (r.getLong(0), r.getLong(1))).head == eg)
    }
  }

  test("count_distinct MV folds inserts AND deletes through the side " +
    "table — values disappearing and appearing adjust the counts " +
    "exactly, with no rebuild") {
    val base = tmp("mv_base23"); val mv = tmp("mv_view23")
    // controlled fixture: group g, value v with known multiplicities
    VersionedTable.write(spark.range(30).select(col("id").as("k"),
      when(col("id") < 15, "A").otherwise("B").as("g"),
      (col("id") % 5).as("v")), base)
    MaterializedView.create(spark, base, mv, Seq("g"),
      Seq(AggSpec("count_distinct", "v", "uv"),
        AggSpec("count", "*", "n")))
    // delete ALL rows with v=2 in group A (value disappears from A
    // only) and SOME rows with v=3 in A (multiplicity drops, count
    // stays); append a brand-new value 9 into B
    VersionedTable.deleteWhereVector(spark, base,
      col("g") === "A" && (col("v") === 2 ||
        (col("v") === 3 && col("k") < 10)))
    VersionedTable.append(spark.range(2).select((col("id") + 100).as("k"),
      lit("B").as("g"), lit(9L).as("v")), base)
    MaterializedView.refresh(spark, mv)
    val ops = VersionedTable.history(spark, mv)
      .select("operation").collect().map(_.getString(0)).toSet
    assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"), ops)
    val exp = VersionedTable.readLatest(spark, base).groupBy("g")
      .agg(countDistinct(col("v")).as("uv"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val got = VersionedTable.readLatest(spark, mv).select("g", "uv", "n")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == exp, s"expected $exp")
    // the side table agrees with a fresh base recount
    val sideRoot = MaterializedView.sideRootOf(mv, "uv")
    val sideExp = VersionedTable.readLatest(spark, base)
      .filter(col("v").isNotNull).groupBy("g", "v")
      .agg(count(lit(1)).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val sideGot = VersionedTable.readLatest(spark, sideRoot)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(sideGot == sideExp)
    // and the refreshed MV serves the rollup again
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base).agg(countDistinct(col("v")).as("u"))
      assert(usesMv(q, sideRoot), q.queryExecution.optimizedPlan.toString)
      assert(q.collect().head.getLong(0) ==
        VersionedTable.readLatest(spark, base)
          .agg(countDistinct(col("v"))).collect().head.getLong(0))
    }
  }

  test("side-fold idempotence: a replayed fold with the same range " +
    "stamp SKIPS (no double-apply) and re-derives the distinct delta " +
    "from the side's own last hop") {
    val side = tmp("mv_side_replay")
    // initial side state: group A holds values 1,2; B holds 2
    VersionedTable.write(spark.createDataFrame(Seq(
      ("A", 1L, 2L), ("A", 2L, 1L), ("B", 2L, 3L)))
      .toDF("g", "v", "_mult"), side)
    // delta: A gains value 9 (+1 appeared), A loses value 2 entirely
    // (−1 disappeared), B's value 2 drops one copy (no distinct change)
    val dm = spark.createDataFrame(Seq(
      ("A", 9L, 1L), ("A", 2L, -1L), ("B", 2L, -1L)))
      .toDF("g", "v", "_dmult")
    val token = "base:7"
    val (v1, d1, rel1) = MaterializedView.foldSideFrame(spark, side,
      Seq("g", "v"), Seq("g"), "uv", dm, token)
    val rows1 = d1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // appeared 9 (+1), disappeared 2 (−1) in A → net 0 (filtered);
    // B unchanged → the delta frame is EMPTY
    assert(rows1.isEmpty, s"A's +1/−1 must net to 0 and filter: $rows1")
    val afterFirst = VersionedTable.readLatest(spark, side)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(afterFirst == Map(("A", 1L) -> 2L, ("A", 9L) -> 1L,
      ("B", 2L) -> 2L))
    // REPLAY with the same stamp (the crash-between-side-and-MV case):
    // the fold must skip — same side version, multiplicities untouched
    val (v2, d2, rel2) = MaterializedView.foldSideFrame(spark, side,
      Seq("g", "v"), Seq("g"), "uv", dm, token)
    assert(v2 == v1, "a replayed fold must not commit again")
    val afterSecond = VersionedTable.readLatest(spark, side)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(afterSecond == afterFirst, "multiplicities must not " +
      s"double-apply: $afterSecond")
    // and the re-derived distinct delta equals the original's
    assert(d2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == rows1)
    rel1(); rel2()
  }

  test("a persisted count_distinct MV discovered by a FRESH driver " +
    "serves the subset distinct rollup from its side table") {
    val base = tmp("mv_base25"); val mv = tmp("mv_view25")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus", "o_orderpriority"),
      Seq(AggSpec("count_distinct", "o_orderkey", "uk"),
        AggSpec("sum", "cents", "s")))
    MaterializedView.clearRegistry() // fresh driver
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base).groupBy("o_orderstatus")
        .agg(countDistinct(col("o_orderkey")).as("u"))
      val side = MaterializedView.sideRootOf(mv, "uk")
      assert(usesMv(q, side),
        "discovery must restore the side-table rollup:\n" +
          q.queryExecution.optimizedPlan)
      val exp = spark.read.format("gvt").load(base).groupBy("o_orderstatus")
        .agg(countDistinct(col("o_orderkey")).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == exp)
      MaterializedView.drop(mv)
    }
  }

  test("count over a nullable column rides the sum's non-null counter") {
    val base = tmp("mv_base8"); val mv = tmp("mv_view8")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 5 === 0, cents("o_totalprice"))
          .as("cents_n")) // 4/5 NULL
    VersionedTable.write(o, base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents_n", "sum_cents")))
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base).groupBy("o_orderstatus")
        .agg(count(col("cents_n")).as("c"), sum(col("cents_n")).as("s"))
      assert(usesMv(q, mv), q.queryExecution.optimizedPlan.toString)
      val exp = spark.read.format("gvt").load(base).groupBy("o_orderstatus")
        .agg(count(col("cents_n")).as("c"), sum(col("cents_n")).as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val got = q.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == exp)
    }
  }

  test("all-null sum groups stay NULL through an incremental refresh") {
    val base = tmp("mv_base9"); val mv = tmp("mv_view9")
    val o = spark.range(10).select(col("id").as("k"),
      (col("id") % 2).cast("string").as("g"),
      when(col("id") % 2 === 0, col("id") * 10).as("v")) // g=1 all NULL
    VersionedTable.write(o, base)
    MaterializedView.create(spark, base, mv, Seq("g"),
      Seq(AggSpec("sum", "v", "sum_v")))
    VersionedTable.append(spark.range(1).select(lit(100L).as("k"),
      lit("1").as("g"), lit(null).cast("long").as("v")), base)
    MaterializedView.refresh(spark, mv)
    val rows = VersionedTable.readLatest(spark, mv)
      .select("g", "sum_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows("1").isEmpty, "all-null group sum must stay NULL")
    assert(rows("0").contains(0L + 20 + 40 + 60 + 80))
  }

  test("kill switch: spark.graft.mvRewrite.enabled=false scans the base") {
    val base = tmp("mv_base10"); val mv = tmp("mv_view10")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("count", "*", "n")))
    GraftSession.withExtensions(spark) { sess =>
      sess.conf.set("spark.graft.mvRewrite.enabled", "false")
      try {
        val q = gvt(sess, base).groupBy("o_orderstatus")
          .agg(count(lit(1)).as("c"))
        assert(!usesMv(q, mv))
      } finally sess.conf.unset("spark.graft.mvRewrite.enabled")
    }
  }

  test("attach restores a persisted MV after the registry is wiped — " +
    "even with the discovery marker gone") {
    val base = tmp("mv_base11"); val mv = tmp("mv_view11")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents")))
    // wipe the in-memory registry AND the storage-backed markers (a
    // lost catalog): discovery finds nothing, the cold query scans the
    // base, and the explicit attach() API restores service from the
    // MV's own _mv metadata
    MaterializedView.clearRegistry()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(base, "_mv_registry"))
    GraftSession.withExtensions(spark) { sess =>
      val cold = gvt(sess, base).groupBy("o_orderstatus")
        .agg(sum("cents").as("s"))
      assert(!usesMv(cold, mv),
        "no registration, no marker: must not rewrite")
      val spec = MaterializedView.attach(mv)
      assert(spec.baseRoot == base && spec.groups == Seq("o_orderstatus"))
      val q = gvt(sess, base).groupBy("o_orderstatus")
        .agg(sum("cents").as("s"))
      assert(usesMv(q, mv))
    }
  }

  test("unreconstructible hop (sidecar-less UPDATE_DV) degrades refresh to a rebuild — never mutates the base") {
    val base = tmp("mv_base13"); val mv = tmp("mv_view13")
    mkBase(base) // NO enableChangeDataFeed: UPDATE_DV leaves no feed
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n_orders")))
    VersionedTable.updateWhereVector(spark, base, col("o_orderkey") % 7 === 0,
      Map("cents" -> (col("cents") + 11)))
    MaterializedView.refresh(spark, mv)
    val ops = VersionedTable.history(spark, mv)
      .select("operation").collect().map(_.getString(0)).toSet
    assert(ops.contains("MV_REBUILD") && !ops.contains("MV_REFRESH"), ops)
    val exp = VersionedTable.readLatest(spark, base).groupBy("o_orderstatus")
      .agg(sum("cents").as("s"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = VersionedTable.readLatest(spark, mv)
      .select("o_orderstatus", "sum_cents", "n_orders")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exp)
  }

  test("continuous refresh: commits on the base stream into MV maintenance") {
    val base = tmp("mv_base14"); val mv = tmp("mv_view14")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n_orders")))
    val qs = MaterializedView.continuousRefresh(spark, mv, tmp("mv_ckpt14"))
    try {
      VersionedTable.append(spark.range(4).select(
        (col("id") + 3000000).as("o_orderkey"), lit("Y").as("o_orderstatus"),
        lit("5-LOW").as("o_orderpriority"), lit(250L).as("cents")), base)
      qs.foreach(_.processAllAvailable())
      val got = VersionedTable.readLatest(spark, mv)
        .filter(col("o_orderstatus") === "Y")
        .select("sum_cents", "n_orders").collect()
      assert(got.length == 1 && got.head.getLong(0) == 1000L &&
        got.head.getLong(1) == 4L, got.mkString(","))
      // MV is fresh → rewrite serves without a manual refresh
      GraftSession.withExtensions(spark) { sess =>
        val q = gvt(sess, base).groupBy("o_orderstatus")
          .agg(sum("cents").as("s"))
        assert(usesMv(q, mv))
      }
    } finally qs.foreach(_.stop())
  }

  test("the MV is itself a gvt table: its keyed change feed streams refresh deltas") {
    val base = tmp("mv_base15"); val mv = tmp("mv_view15")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n_orders")))
    VersionedTable.append(spark.range(3).select(
      (col("id") + 4000000).as("o_orderkey"), lit("W").as("o_orderstatus"),
      lit("3-MEDIUM").as("o_orderpriority"), lit(200L).as("cents")), base)
    MaterializedView.refresh(spark, mv)
    // keyed diff across the refresh hop: only the touched group changes
    val v = VersionedTable.latestVersion(mv).get
    val feed = VersionedTable.changes(spark, mv, v - 1, v,
      keys = Seq("o_orderstatus"))
    val rows = feed.select("o_orderstatus", "_change_type")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSet == Set(("W", "insert")),
      s"refresh delta should be exactly the new group: ${rows.mkString(",")}")
  }

  test("distinct / filtered aggregates and non-group filters do NOT rewrite") {
    val base = tmp("mv_base12"); val mv = tmp("mv_view12")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n")))
    GraftSession.withExtensions(spark) { sess =>
      val d = gvt(sess, base).groupBy("o_orderstatus")
        .agg(countDistinct(col("o_orderpriority")).as("c"))
      assert(!usesMv(d, mv), "DISTINCT is not re-aggregable")
      val f = gvt(sess, base).filter(col("cents") > 100)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("c"))
      assert(!usesMv(f, mv), "data-column filter must scan the base")
    }
  }

  test("compound output expressions over covered aggregates rewrite " +
    "(sum/count divide, coalesce, multi-aggregate arithmetic)") {
    val base = tmp("mv_base13"); val mv = tmp("mv_view13")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n")))
    def shape(s: org.apache.spark.sql.SparkSession) =
      s.read.format("gvt").load(base).groupBy("o_orderstatus")
        .agg((sum(col("cents")).cast("double") / count(lit(1))).as("avg_c"),
          coalesce(sum(col("cents")), lit(0L)).as("s0"),
          (sum(col("cents")) + count(lit(1))).as("mix"))
        .orderBy("o_orderstatus")
    GraftSession.withExtensions(spark) { sess =>
      val q = shape(sess)
      assert(usesMv(q, mv), q.queryExecution.optimizedPlan.toString)
      val exp = shape(spark).collect().map(r =>
        r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
      val got = q.collect().map(r =>
        r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == exp)
    }
  }

  test("the rewrite serves the PINNED MV snapshot — a newer MV commit " +
    "(a fold landed ahead of its registry swap) is invisible") {
    val base = tmp("mv_base15"); val mv = tmp("mv_view15")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n")))
    val exp = spark.read.format("gvt").load(base).groupBy("o_orderstatus")
      .agg(sum("cents").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // out-of-band commit on the MV TABLE only (the torn state between a
    // concurrent fold's commit and its registry swap): doubled sums
    val junk = spark.read.format("gvt").load(mv)
      .withColumn("sum_cents", col("sum_cents") * 2)
    VersionedTable.write(junk, mv, operation = "MV_REFRESH")
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base).groupBy("o_orderstatus")
        .agg(sum("cents").as("s"))
      assert(usesMv(q, mv), q.queryExecution.optimizedPlan.toString)
      val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exp, "rewrite must read the registration's pinned " +
        "MV version, not whatever is latest on disk")
    }
  }

  test("concurrent refresh calls serialize: one fold commits, the " +
    "second sees fresh and no-ops") {
    val base = tmp("mv_base16"); val mv = tmp("mv_view16")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n")))
    VersionedTable.append(spark.range(4).select(
      (col("id") + 500000).as("o_orderkey"), lit("Y").as("o_orderstatus"),
      lit("2-HIGH").as("o_orderpriority"), lit(1000L).as("cents")), base)
    val threads = (1 to 2).map(_ => new Thread(() => {
      MaterializedView.refresh(spark, mv); ()
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    val refreshes = VersionedTable.history(spark, mv)
      .select("operation").collect().map(_.getString(0))
      .count(_ == "MV_REFRESH")
    assert(refreshes == 1,
      s"two concurrent refreshes must fold the delta exactly once ($refreshes)")
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base).groupBy("o_orderstatus")
        .agg(sum(col("cents")).as("s"), count(lit(1)).as("c"))
      assert(usesMv(q, mv))
      val y = q.filter(col("o_orderstatus") === "Y").collect()
      assert(y.length == 1 && y.head.getLong(1) == 4000L &&
        y.head.getLong(2) == 4L)
    }
  }

  test("storage-backed registry: a FRESH driver discovers a persisted " +
    "MV on first planner contact and rewrites; DROP propagates") {
    val base = tmp("mv_base17"); val mv = tmp("mv_view17")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n")))
    // simulate a fresh driver: in-memory registry AND probe cache wiped
    MaterializedView.clearRegistry()
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base).groupBy("o_orderstatus")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"))
      assert(usesMv(q, mv),
        "first contact with the base must discover the persisted MV:\n" +
          q.queryExecution.optimizedPlan)
      val exp = spark.read.format("gvt").load(base).groupBy("o_orderstatus")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val got = q.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == exp)
    }
    // DROP removes the storage-backed marker: the NEXT fresh driver
    // must not rediscover the view
    MaterializedView.drop(mv)
    MaterializedView.clearRegistry()
    GraftSession.withExtensions(spark) { sess =>
      val q2 = gvt(sess, base).groupBy("o_orderstatus")
        .agg(sum("cents").as("s"))
      assert(!usesMv(q2, mv), "a dropped view must not be rediscovered")
    }
  }

  test("DROP from a FRESH driver (empty registry, no prior planner " +
    "contact) still deletes the storage-backed marker") {
    val base = tmp("mv_base19"); val mv = tmp("mv_view19")
    mkBase(base)
    MaterializedView.create(spark, base, mv, Seq("o_orderstatus"),
      Seq(AggSpec("sum", "cents", "sum_cents")))
    // a fresh driver that runs DROP as its FIRST statement: the
    // in-memory registries are empty and nothing triggered the lazy
    // discovery, so the base roots must resolve from the MV table's
    // own _mv metadata — without that fallback the marker survives
    // and later drivers re-attach the dropped view
    MaterializedView.clearRegistry()
    MaterializedView.drop(mv)
    MaterializedView.clearRegistry()
    GraftSession.withExtensions(spark) { sess =>
      val q = gvt(sess, base).groupBy("o_orderstatus")
        .agg(sum("cents").as("s"))
      assert(!usesMv(q, mv),
        "a view dropped by a fresh driver must not be rediscovered:\n" +
          q.queryExecution.optimizedPlan)
    }
  }

  test("storage-backed registry discovers EXACT views too (defining " +
    "views re-created in the fresh session)") {
    val base = tmp("mv_base18"); val mv = tmp("mv_view18")
    mkBase(base)
    GraftSession.withExtensions(spark) { sess =>
      gvt(sess, base).createOrReplaceTempView("mv_disc_t")
      MaterializedView.createExact(sess, mv,
        "SELECT o_orderstatus, count(DISTINCT o_orderpriority) AS dp " +
          "FROM mv_disc_t GROUP BY o_orderstatus")
      MaterializedView.clearRegistry()
      // fresh driver: the defining view is back in scope, so discovery
      // can rebuild the match plan
      gvt(sess, base).createOrReplaceTempView("mv_disc_t")
      val q = sess.sql(
        "SELECT o_orderstatus, count(DISTINCT o_orderpriority) AS dp " +
          "FROM mv_disc_t GROUP BY o_orderstatus")
      assert(usesMv(q, mv), q.queryExecution.optimizedPlan.toString)
      MaterializedView.drop(mv)
    }
  }

  test("SQL over a registered view NAME rewrites through the MV") {
    val base = tmp("mv_base14"); val mv = tmp("mv_view14")
    mkBase(base)
    MaterializedView.create(spark, base, mv,
      Seq("o_orderstatus", "o_orderpriority"),
      Seq(AggSpec("sum", "cents", "sum_cents"),
        AggSpec("count", "*", "n")))
    GraftSession.withExtensions(spark) { sess =>
      sess.read.format("gvt").load(base)
        .createOrReplaceTempView("mv_named_t")
      val q = sess.sql(
        """SELECT o_orderstatus, sum(cents) AS s, count(*) AS c
          |FROM mv_named_t
          |WHERE o_orderpriority = '1-URGENT'
          |GROUP BY o_orderstatus""".stripMargin)
      assert(usesMv(q, mv), q.queryExecution.optimizedPlan.toString)
      val exp = spark.read.format("gvt").load(base)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val got = q.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == exp)
    }
  }
}
