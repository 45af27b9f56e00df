package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps.topKPerKey

/** The custom GroupedTopK operator must agree exactly with the window
  * row_number formulation, and its physical plan must show the
  * partial→exchange→final shape with no Window/full Sort. */
class GroupedTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val order = Seq(col("l_extendedprice").desc, col("l_orderkey"),
    col("l_partkey"), col("l_linenumber"))

  test("grouped top-k equals the window row_number formulation") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    for (k <- Seq(1, 3, 10)) {
      val custom = topKPerKey(li, Seq(col("l_returnflag"), col("l_linestatus")), order, k)
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_partkey", "l_linenumber")
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy(col("l_returnflag"), col("l_linestatus"))
        .orderBy(order: _*)
      val reference = li.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= k)
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_partkey", "l_linenumber")
        .collect().map(_.toSeq).toSet
      assert(custom == reference, s"mismatch at k=$k")
    }
  }

  test("plan shape: partial and final GroupedTopKExec around one exchange, no Window") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val df = topKPerKey(li, Seq(col("l_returnflag")), order, 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("GroupedTopK \\[".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("handles empty input and k larger than group size") {
    import spark.implicits._
    val tiny = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    val out = topKPerKey(tiny, Seq(col("g")), Seq(col("v").desc), 10)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("a", 1), ("a", 2), ("b", 3)))
    val empty = topKPerKey(tiny.filter(col("v") > 100), Seq(col("g")),
      Seq(col("v")), 2)
    assert(empty.count() == 0)
  }
}
