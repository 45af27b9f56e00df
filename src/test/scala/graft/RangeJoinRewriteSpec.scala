package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RangeJoinRewrite: a bare `p BETWEEN lo AND hi` inner join compiles
  * into the bucketed equi-join when the session sets the bin-width conf
  * — and every conservatism guard declines exactly when it should. */
class RangeJoinRewriteSpec extends AnyFunSuite {

  private val WidthKey = graft.plans.RangeJoinRewrite.WidthKey

  private def withExtensionsSession[A](f: SparkSession => A): A = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .withExtensions(new GraftExtensions()).getOrCreate()
      try f(sess)
      finally {
        sess.conf.unset(WidthKey)
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def points(s: SparkSession): DataFrame =
    s.range(500).select(col("id").as("p"), (col("id") % 13).as("tag"))

  // 60 intervals of span 0..18, some inverted (lo > hi: must match nothing)
  private def intervals(s: SparkSession): DataFrame =
    s.range(60).select((col("id") * 9).as("lo"),
      (col("id") * 9 + (col("id") % 4) * 6 - 3).as("hi"), col("id").as("iid"))

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def joined(s: SparkSession): DataFrame =
    points(s).join(intervals(s),
      col("p") >= col("lo") && col("p") <= col("hi"))

  test("between join rewrites to a bucketed equi-join, results identical") {
    withExtensionsSession { sess =>
      sess.conf.set(WidthKey, "8")
      val df = joined(sess)
      val plan = planOf(df)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"the nested-loop join must be gone:\n$plan")
      assert(plan.contains("__bucket"), s"expected the bucket equi-key:\n$plan")
      val got = df.collect().map(_.toSeq).toSet
      val base = joined(TestSpark.spark).collect().map(_.toSeq).toSet
      assert(got == base, "rewritten results must equal the nested-loop results")
      assert(got.nonEmpty, "fixture must genuinely match rows")
    }
  }

  test("intervals-on-the-left and reversed comparison orientations also rewrite") {
    withExtensionsSession { sess =>
      sess.conf.set(WidthKey, "8")
      val df = intervals(sess).join(points(sess),
        col("lo") <= col("p") && col("hi") >= col("p"))
      val plan = planOf(df)
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"got:\n$plan")
      val base = intervals(TestSpark.spark).join(points(TestSpark.spark),
        col("lo") <= col("p") && col("hi") >= col("p"))
      assert(df.collect().map(_.toSeq).toSet == base.collect().map(_.toSeq).toSet)
    }
  }

  test("guards: no conf, extra conjunct, strict bound, equi-key present — all decline") {
    withExtensionsSession { sess =>
      // width unset -> rule off
      assert(planOf(joined(sess)).contains("BroadcastNestedLoopJoin"))
      sess.conf.set(WidthKey, "8")
      // extra conjunct: rule must not fire (it cannot prove it)
      val extra = points(sess).join(intervals(sess),
        col("p") >= col("lo") && col("p") <= col("hi") && col("tag") =!= col("iid"))
      assert(planOf(extra).contains("BroadcastNestedLoopJoin"))
      // strict bound changes semantics: decline
      val strict = points(sess).join(intervals(sess),
        col("p") > col("lo") && col("p") <= col("hi"))
      assert(planOf(strict).contains("BroadcastNestedLoopJoin"))
      // an equi-key already avoids the BNLJ: leave it to the normal planner
      val equi = points(sess).join(intervals(sess),
        col("tag") === col("iid") && col("p") >= col("lo") && col("p") <= col("hi"))
      val equiPlan = planOf(equi)
      assert(!equiPlan.contains("__bucket"), s"must not touch equi joins:\n$equiPlan")
    }
  }

  test("hint('range_join', w): per-join width, no session conf involved") {
    withExtensionsSession { sess =>
      // NO WidthKey conf set anywhere in this test
      val df = points(sess).join(intervals(sess).hint("range_join", 8),
        col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = planOf(df)
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"got:\n$plan")
      assert(plan.contains("__bucket"), s"expected the bucket equi-key:\n$plan")
      assert(!plan.contains("range_join_width"),
        s"consumed hint must be stripped from the plan:\n$plan")
      val base = joined(TestSpark.spark).collect().map(_.toSeq).toSet
      assert(df.collect().map(_.toSeq).toSet == base)
    }
  }

  test("two range joins in ONE plan carry two different hinted widths") {
    withExtensionsSession { sess =>
      val a = points(sess).join(intervals(sess).hint("range_join", 4),
        col("p") >= col("lo") && col("p") <= col("hi"))
        .select(col("p"), col("iid"))
      val pts2 = sess.range(500).select((col("id") * 100).as("q"))
      val ivs2 = sess.range(60).select((col("id") * 900).as("qlo"),
        (col("id") * 900 + 500).as("qhi"))
      // 100× larger value scale: a width tuned for join A (4) would
      // explode each of these intervals into ~126 bucket rows — the
      // session-conf cross-contamination this mechanism eliminates
      val b = pts2.join(ivs2.hint("range_join", 512),
        col("q") >= col("qlo") && col("q") <= col("qhi"))
        .select(col("q"), col("qlo"))
      // the deliberate 1-row crossJoin glue is a legitimate BNLJ; the
      // assertions target the two BETWEEN joins via their bucket divisors
      val both = a.crossJoin(b.limit(1))
      val optimized = both.queryExecution.optimizedPlan.toString
      assert(planOf(both).contains("__bucket"))
      // both widths appear as their respective bucket divisors
      assert(optimized.contains("4.0") && optimized.contains("512.0"),
        s"expected per-join divisors 4.0 and 512.0:\n$optimized")
      val baseA = joined(TestSpark.spark).select(col("p"), col("iid"))
      assert(a.collect().map(_.toSeq).toSet == baseA.collect().map(_.toSeq).toSet)
    }
  }

  test("a hint on an unmatched join never leaks to an enclosing BETWEEN join") {
    withExtensionsSession { sess =>
      // hinted join declines the rewrite (extra equi conjunct); its
      // surviving marker sits inside ITS join subtree
      val innerRes = points(sess).join(intervals(sess).hint("range_join", 8),
        col("p") >= col("lo") && col("p") <= col("hi") && col("tag") === col("iid"))
        .select(col("lo").as("lo2"), col("hi").as("hi2"))
      // an enclosing BETWEEN join over that result must NOT adopt width 8
      // (a width tuned for one axis can flood a different one) — with no
      // conf and no hint of its own it stays the nested loop
      val pts2 = sess.range(100).select(col("id").as("q"))
      val outer = pts2.join(innerRes,
        col("q") >= col("lo2") && col("q") <= col("hi2"))
      val plan = planOf(outer)
      assert(!plan.contains("__bucket"), s"leaked width must not rewrite:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("registry q_range_join_rewrite: bucketed plan, result equals the API path") {
    val dir = "/root/testdata/sf0.001"
    val sess = TestSpark.spark
    // the registry fn installs the rule + width on the session; restore
    // both after execution so other suites see a pristine shared session
    val prevRules = sess.experimental.extraOptimizations
    try {
      val df = graft.queries.RelationalQueries
        .queries("q_range_join_rewrite")(sess, dir)
      val plan = planOf(df)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"the declarative BETWEEN join must compile to the bucketed join:\n$plan")
      val api = graft.queries.RelationalQueries
        .queries("q_range_join")(sess, dir)
      assert(df.collect().map(_.toSeq).toSeq == api.collect().map(_.toSeq).toSeq,
        "rewrite path and API path must agree")
    } finally {
      sess.experimental.extraOptimizations = prevRules
      sess.conf.unset(WidthKey)
    }
  }

  test("inverted intervals (lo > hi) match nothing, exactly like the nested loop") {
    withExtensionsSession { sess =>
      sess.conf.set(WidthKey, "5")
      // bounds must be data-dependent: literal columns constant-fold into
      // a pushed filter and the join condition vanishes before the rule
      val inv = sess.range(10).select((col("id") + 50L).as("lo"),
        (col("id") + 40L).as("hi"))
      val df = points(sess).join(inv, col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!planOf(df).contains("BroadcastNestedLoopJoin"))
      assert(df.count() == 0)
    }
  }
}
