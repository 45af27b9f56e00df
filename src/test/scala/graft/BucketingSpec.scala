package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed on the join key →
  * the sort-merge join reads bucket-aligned files with NO shuffle
  * exchange. This is the 100 TB answer to the repeated big⋈big join on a
  * stable key (bucket once at write time, every later join is
  * exchange-free); asserted here on the physical plan. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed-by-key tables sort-merge join with zero shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.read.parquet(s"$dir/lineitem.parquet")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("qty"))
      joined.collect() // force final (AQE) plan
      // AQE toString appends the pre-adaptive "Initial Plan" — inspect the
      // final plan section only
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // one exchange is legal for the groupBy; the JOIN itself must not
      // shuffle either side -> exactly 1 ShuffleExchange in the whole plan
      val exchanges = "ShuffleExchange|Exchange hashpartitioning".r
        .findAllIn(plan).size
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(exchanges <= 1, s"join sides must be exchange-free:\n$plan")

      // control: the same join on plain parquet shuffles both sides
      val unbucketed = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("qty"))
      unbucketed.collect()
      val controlExchanges = "Exchange hashpartitioning".r
        .findAllIn(unbucketed.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head).size
      assert(controlExchanges >= 2, "control join should shuffle both sides")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
