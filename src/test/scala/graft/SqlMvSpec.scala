package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MaterializedView, VersionedTable}

/** SQL surface of the materialized-view feature: CREATE MATERIALIZED
  * VIEW extracts the spec from the defining query's analyzed plan,
  * REFRESH drives maintenance, and unsupported defining shapes refuse
  * loudly instead of materializing something the rewrite cannot serve.
  */
class SqlMvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def mkBase(root: String, view: String): Unit = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
    VersionedTable.write(o, root)
  }

  test("CREATE + REFRESH MATERIALIZED VIEW end-to-end, rewrite served") {
    val base = tmp("sqlmv_base"); val mv = tmp("sqlmv_view")
    mkBase(base, "sqlmv_t")
    GraftSession.withExtensions(spark) { sess =>
      sess.read.format("gvt").load(base).createOrReplaceTempView("sqlmv_t")
      val created = sess.sql(
        s"CREATE MATERIALIZED VIEW gvt.`$mv` AS " +
          "SELECT status, prio, sum(cents) AS sum_cents, count(*) AS n " +
          "FROM sqlmv_t GROUP BY status, prio").collect()
      assert(created.head.getString(0) == mv)
      val q = sess.read.format("gvt").load(base).groupBy("status")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"))
      assert(TestSpark.scansUnder(q, mv))
      // stale after an append; REFRESH restores service
      VersionedTable.append(sess.range(2).select(
        (col("id") + 900000).as("k"), lit("Z").as("status"),
        lit("1-URGENT").as("prio"), lit(50L).as("cents")), base)
      val q2 = sess.read.format("gvt").load(base).groupBy("status")
        .agg(sum("cents").as("s"))
      assert(!TestSpark.scansUnder(q2, mv))
      sess.sql(s"REFRESH MATERIALIZED VIEW gvt.`$mv`").collect()
      val q3 = sess.read.format("gvt").load(base).groupBy("status")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"))
      assert(TestSpark.scansUnder(q3, mv))
      val z = q3.filter(col("status") === "Z").collect()
      assert(z.length == 1 && z.head.getLong(1) == 100L && z.head.getLong(2) == 2L)
    }
  }

  test("non-algebraic defining shapes register as EXACT views and serve their shape") {
    val base = tmp("sqlmv_base2")
    mkBase(base, "sqlmv_t2")
    GraftSession.withExtensions(spark) { sess =>
      sess.read.format("gvt").load(base).createOrReplaceTempView("sqlmv_t2")
      def exactServes(defSql: String): Unit = {
        val t = tmp("sqlmv_exact")
        val row = sess.sql(
          s"CREATE MATERIALIZED VIEW gvt.`$t` AS $defSql").collect().head
        assert(row.getLong(1) == -1L, "non-algebraic shape → exact tier")
        val q = sess.sql(defSql)
        assert(TestSpark.scansUnder(q, t),
          s"exact view must serve [$defSql]:\n" +
            q.queryExecution.optimizedPlan)
      }
      exactServes("SELECT status, avg(cents) AS a FROM sqlmv_t2 " +
        "GROUP BY status")
      exactServes("SELECT status, sum(cents) AS s FROM sqlmv_t2 " +
        "WHERE prio = '2-HIGH' GROUP BY status")
      exactServes("SELECT status AS st, sum(cents) AS s FROM sqlmv_t2 " +
        "GROUP BY status")
      // target form is still a hard error — the MV table needs a path
      val e = intercept[Exception](sess.sql("CREATE MATERIALIZED VIEW " +
        "badname AS SELECT status, sum(cents) AS s FROM sqlmv_t2 " +
        "GROUP BY status").collect())
      assert(e.getMessage.contains("gvt.`/path` form"))
    }
  }

  test("CREATE MATERIALIZED VIEW with count(DISTINCT col) goes " +
    "ALGEBRAIC: side-table maintenance through DML, subset rollup " +
    "serves off the side table") {
    val base = tmp("sqlmv_base5"); val mv = tmp("sqlmv_view5")
    mkBase(base, "sqlmv_t5")
    GraftSession.withExtensions(spark) { sess =>
      sess.read.format("gvt").load(base).createOrReplaceTempView("sqlmv_t5")
      val created = sess.sql(
        s"CREATE MATERIALIZED VIEW gvt.`$mv` AS " +
          "SELECT status, count(DISTINCT prio) AS up, count(*) AS n " +
          "FROM sqlmv_t5 GROUP BY status").collect()
      assert(created.head.getLong(1) >= 0L,
        "count(DISTINCT) must register as an algebraic view")
      // a delete + an append with a NEW prio value fold incrementally
      VersionedTable.deleteWhereVector(sess, base, col("k") % 9 === 0)
      VersionedTable.append(sess.range(3).select(
        (col("id") + 800000).as("k"), lit("O").as("status"),
        lit("9-NEW").as("prio"), lit(10L).as("cents")), base)
      sess.sql(s"REFRESH MATERIALIZED VIEW gvt.`$mv`").collect()
      val ops = VersionedTable.history(sess, mv)
        .select("operation").collect().map(_.getString(0)).toSet
      assert(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"), ops)
      val q = sess.read.format("gvt").load(base).groupBy("status")
        .agg(countDistinct(col("prio")).as("up"), count(lit(1)).as("n"))
      assert(TestSpark.scansUnder(q, mv), q.queryExecution.optimizedPlan)
      val exp = spark.read.format("gvt").load(base).groupBy("status")
        .agg(countDistinct(col("prio")).as("up"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(q.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap == exp)
      // global rollup scans only the multiplicity side table
      val side = MaterializedView.sideRootOf(mv, "up")
      val q2 = sess.read.format("gvt").load(base)
        .agg(countDistinct(col("prio")).as("u"))
      assert(TestSpark.scansUnder(q2, side),
        q2.queryExecution.optimizedPlan)
      assert(q2.collect().head.getLong(0) ==
        spark.read.format("gvt").load(base)
          .agg(countDistinct(col("prio"))).collect().head.getLong(0))
      MaterializedView.drop(mv)
    }
  }

  test("SHOW MATERIALIZED VIEWS lists both tiers with freshness; " +
    "ON <base> discovers persisted registrations") {
    val base = tmp("sqlmv_base3"); val mv = tmp("sqlmv_show")
    mkBase(base, "sqlmv_t3")
    GraftSession.withExtensions(spark) { sess =>
      sess.read.format("gvt").load(base).createOrReplaceTempView("sqlmv_t3")
      sess.sql(s"CREATE MATERIALIZED VIEW gvt.`$mv` AS " +
        "SELECT status, sum(cents) AS s, count(*) AS n " +
        "FROM sqlmv_t3 GROUP BY status").collect()
      def rowOf(sql: String) = sess.sql(sql).collect()
        .find(_.getString(0) == mv)
      val fresh = rowOf("SHOW MATERIALIZED VIEWS")
      assert(fresh.exists(r => r.getString(1) == "algebraic" &&
        r.getString(2) == base && r.getBoolean(5)), fresh.toString)
      // a base commit flips freshness off; REFRESH restores it
      VersionedTable.append(sess.range(1).select(lit(12345678L).as("k"),
        lit("Q").as("status"), lit("1-URGENT").as("prio"),
        lit(9L).as("cents")), base)
      assert(rowOf("SHOW MATERIALIZED VIEWS").exists(!_.getBoolean(5)))
      sess.sql(s"REFRESH MATERIALIZED VIEW gvt.`$mv`").collect()
      assert(rowOf("SHOW MATERIALIZED VIEWS").exists(_.getBoolean(5)))
      // ON <base> runs the storage-backed discovery: after a registry
      // wipe (fresh driver), the persisted view lists again
      MaterializedView.clearRegistry()
      assert(rowOf(s"SHOW MATERIALIZED VIEWS ON gvt.`$base`").isDefined,
        "ON <base> must discover the persisted registration")
      sess.sql(s"DROP MATERIALIZED VIEW gvt.`$mv`").collect()
      assert(rowOf("SHOW MATERIALIZED VIEWS").isEmpty)
    }
  }
}
