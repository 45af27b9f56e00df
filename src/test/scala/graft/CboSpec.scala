package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Cost-based optimization: with ANALYZE-computed table + column stats,
  * Catalyst's CBO join reorder rewrites a badly-written join chain
  * (big ⋈ big first, selective dimension last) so the selective join
  * runs first — at 100 TB the difference between shuffling the full
  * fact⋈fact intermediate and pre-shrinking it by the dimension filter.
  * The rule needs real statistics: it does nothing without ANALYZE. */
class CboSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join reorder with stats moves the selective dimension join first") {
    val dir = "/root/testdata/sf0.001"
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      for (t <- Seq("lineitem", "orders", "customer")) {
        spark.sql(s"DROP TABLE IF EXISTS cbo_$t")
        spark.read.parquet(s"$dir/$t.parquet").write.saveAsTable(s"cbo_$t")
      }
      spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR ALL COLUMNS")
      // written order: big ⋈ big first, tiny filtered dim last
      def query() = spark.sql(
        """SELECT c.c_mktsegment, sum(l.l_quantity) AS qty
          |FROM cbo_lineitem l
          |JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
          |JOIN cbo_customer c ON o.o_custkey = c.c_custkey
          |WHERE c.c_mktsegment = 'BUILDING'
          |GROUP BY c.c_mktsegment""".stripMargin)
      def joinOrder(on: Boolean): String = {
        spark.conf.set("spark.sql.cbo.enabled", on.toString)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", on.toString)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = query().queryExecution.optimizedPlan.toString
        // sequence of base relations as they appear in the join tree
        "cbo_(lineitem|orders|customer)".r.findAllIn(plan).toSeq.mkString(",")
      }
      val without = joinOrder(on = false)
      val withCbo = joinOrder(on = true)
      assert(without != withCbo,
        s"expected stats-driven reorder to change the join tree; both = $withCbo")
      // orders⋈customer (selective) must join before lineitem enters
      assert(withCbo.indexOf("cbo_customer") < withCbo.indexOf("cbo_lineitem"),
        s"selective dim join should come first with CBO: $withCbo")
      // and the reordered plan still computes the same result
      assert(query().collect().nonEmpty)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      for (t <- Seq("lineitem", "orders", "customer"))
        spark.sql(s"DROP TABLE IF EXISTS cbo_$t")
    }
  }
}
