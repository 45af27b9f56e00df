package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps._

/** The reference's five gold marts (SURVEY.md §2.9), re-expressed over the
  * testdata star schema (role mapping FIXTURES.md §B.1: orders→orders,
  * order_products→lineitem, products→part, users→customer, dept→nation).
  * Semantics follow the corrected serverless-SQL notebook
  * (03_gold_metrics_serverless.py — SURVEY.md §2.11), not the buggy
  * DataFrame notebook.
  *
  * Join strategy at scale: nation/region are fixed-cardinality → explicit
  * broadcast; part/customer/orders scale with the data → left to
  * Catalyst/AQE (sort-merge or shuffled-hash on the join key; AQE converts
  * to broadcast when a side is small at runtime). Aggregates are all
  * hash-aggregates with map-side partial combine. Every output is
  * deterministic: rounded doubles, dates as strings, total ORDER BY.
  */
object GoldMarts {

  /** fct_orders analogue — star join + md5 surrogate key
    * (reference 03_gold_metrics_serverless.py:72-121). Grain: line item. */
  def fctOrderItems(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
                    customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(part, lineitem("l_partkey") === part("p_partkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(
        surrogateKey(col("l_orderkey"), col("l_partkey"), col("l_linenumber")).as("order_item_key"),
        col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("o_custkey"),
        col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        col("l_returnflag"),
        col("o_orderstatus"),
        col("p_brand"),
        col("n_name").as("nation_name"),
        col("r_name").as("region_name"))

  /** dim_users analogue — per-order stats, then per-customer aggregates +
    * three segment CASEs (reference 03_gold_metrics_serverless.py:124-189).
    * Customers with no orders are kept via LEFT JOIN + COALESCE defaults
    * (the corrected dim semantics, SURVEY.md §2.11 item 3). */
  def dimUsers(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    // per-order stats (basket size, returned items, per-order return rate
    // with nullif guard — reference P18, 03_gold_metrics.py:118-121)
    val orderStats = lineitem.groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("basket_size"),
      sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returned_items"))
      // Integer percent (0-100): exactly representable in binary, so the
      // downstream avg sums exactly in ANY order — immune to the
      // partial-aggregation sum-order ulp noise that makes rounding an avg
      // of 2-decimal doubles nondeterministic at half-way ties.
      .withColumn("order_return_rate",
        rnd(safeDiv(col("returned_items").cast("double") * lit(100.0),
          col("basket_size").cast("double")), 0))
    // orders ⟕ stats: keep orders with no line items
    val perOrder = orders.join(orderStats, orders("o_orderkey") === orderStats("l_orderkey"), "left")
    val userStats = perOrder.groupBy(col("o_custkey")).agg(
      countDistinct(col("o_orderkey")).as("total_orders"),
      coalesce(sum(col("basket_size")), lit(0L)).as("lifetime_items"),
      rnd(avg(col("basket_size")), 2).as("avg_basket_size"),
      rnd(avg(col("order_return_rate")), 4).as("avg_return_rate"),
      max(col("o_totalprice")).as("max_order_price"))
    customer
      .join(userStats, customer("c_custkey") === userStats("o_custkey"), "left")
      .select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("segment"),
        coalesce(col("total_orders"), lit(0L)).as("total_orders"),
        coalesce(col("lifetime_items"), lit(0L)).as("lifetime_items"),
        coalesce(col("avg_basket_size"), lit(0.0)).as("avg_basket_size"),
        coalesce(col("avg_return_rate"), lit(0.0)).as("avg_return_rate"),
        coalesce(col("max_order_price"), lit(0.0)).as("max_order_price"))
      .withColumns(Map(
        // reference P13 tiering CASEs (03_gold_metrics_serverless.py:165-181)
        "frequency_segment" ->
          when(col("total_orders") >= 15, "power")
            .when(col("total_orders") >= 8, "regular")
            .when(col("total_orders") >= 1, "occasional")
            .otherwise("inactive"),
        "basket_segment" ->
          when(col("avg_basket_size") >= 6.0, "large")
            .when(col("avg_basket_size") >= 3.0, "medium")
            .otherwise("small")))
      .orderBy(col("customer_id"))
  }

  /** dim_products analogue — per-part stats incl. exact distinct users,
    * LEFT JOIN + COALESCE defaults, popularity tier
    * (reference 03_gold_metrics_serverless.py:192-242). */
  def dimProducts(part: DataFrame, lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val stats = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .groupBy(col("l_partkey")).agg(
        countDistinct(col("l_orderkey")).as("times_ordered"),
        countDistinct(col("o_custkey")).as("unique_users"),
        sum(col("l_quantity")).as("total_quantity"),
        rnd(avg(col("l_linenumber").cast("double")), 4).as("avg_cart_position"),
        rnd(avg(when(col("l_returnflag") === "R", 1.0).otherwise(0.0)), 4).as("return_rate"))
    part
      .join(stats, part("p_partkey") === stats("l_partkey"), "left")
      .select(
        col("p_partkey").as("product_id"),
        col("p_name").as("product_name"),
        col("p_brand").as("brand"),
        col("p_type").as("product_type"),
        coalesce(col("times_ordered"), lit(0L)).as("times_ordered"),
        coalesce(col("unique_users"), lit(0L)).as("unique_users"),
        coalesce(col("total_quantity"), lit(0.0)).as("total_quantity"),
        coalesce(col("avg_cart_position"), lit(0.0)).as("avg_cart_position"),
        coalesce(col("return_rate"), lit(0.0)).as("return_rate"))
      .withColumn("popularity_tier",
        when(col("times_ordered") >= 40, "top")
          .when(col("times_ordered") >= 20, "high")
          .when(col("times_ordered") >= 5, "medium")
          .otherwise("low"))
      .orderBy(col("product_id"))
  }

  /** mart_dept_performance analogue at nation grain — scoped filter,
    * multi-key aggs, six conditional shares, percent-of-grand-total via a
    * broadcast 1-row cross join, sorted desc
    * (reference 03_gold_metrics_serverless.py:245-308). */
  def martNationPerformance(lineitem: DataFrame, orders: DataFrame,
                            customer: DataFrame, nation: DataFrame): DataFrame = {
    val base = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .filter(col("o_orderstatus") === "F") // 'prior'-scope analogue (P6)
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .withColumn("day_name", dayNameSunday0(dayofweek(col("o_orderdate")) - 1))
    val agg0 = base.groupBy(col("n_nationkey").as("nation_id"), col("n_name").as("nation_name"))
      .agg(
        count(lit(1)).as("total_line_items"),
        countDistinct(col("o_orderkey")).as("unique_orders"),
        countDistinct(col("o_custkey")).as("unique_users"),
        rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("total_revenue"),
        rnd(avg(col("l_quantity")), 4).as("avg_quantity"),
        rnd(share(col("o_orderpriority") === "1-URGENT"), 4).as("pct_urgent"),
        rnd(share(col("o_orderpriority") === "5-LOW"), 4).as("pct_low_priority"),
        rnd(share(col("day_name") === "Saturday" || col("day_name") === "Sunday"), 4).as("pct_weekend"),
        rnd(share(col("day_name") === "Monday"), 4).as("pct_monday"),
        rnd(share(col("l_returnflag") === "R"), 4).as("pct_returned"),
        rnd(share(col("l_quantity") >= 25.0), 4).as("pct_bulk"))
    // Grand total derived from agg0 itself (Σ per-nation line counts ≡
    // COUNT(*) of base): the 4-way star join executes ONCE. The previous
    // form re-aggregated `base` for the total, putting the join subtree in
    // the plan twice — at 100 TB that doubles the dominant scan+join cost.
    withPctOfTotalFromAgg(agg0, "total_line_items", "pct_of_total_items", 4)
      .orderBy(col("total_line_items").desc, col("nation_id"))
  }

  /** mart_reorder_velocity analogue — purchase sequence per (customer,
    * part) via row_number + lag, position bucket, agg with HAVING, sorted
    * (reference 03_gold_metrics_serverless.py:311-371). */
  def martRepeatVelocity(lineitem: DataFrame, orders: DataFrame,
                         minPurchases: Long = 3L): DataFrame = {
    val seqBase = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .filter(col("o_orderstatus") =!= "P") // '!= test' analogue (P7, corrected semantics)
      .select(col("o_custkey"), col("l_partkey"), col("o_orderdate"),
        col("o_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
    val ranked = lagPrev(
      sequenceRank(seqBase, Seq("o_custkey", "l_partkey"),
        Seq(col("o_orderdate"), col("o_orderkey"), col("l_linenumber"))),
      when(col("l_returnflag") === "R", 1).otherwise(0),
      Seq("o_custkey", "l_partkey"),
      Seq(col("o_orderdate"), col("o_orderkey"), col("l_linenumber")),
      0, "prev_was_return")
      .withColumn("position_bucket",
        when(col("purchase_seq") === 1, "first")
          .when(col("purchase_seq").between(2, 3), "early")
          .when(col("purchase_seq").between(4, 5), "mid")
          .otherwise("late"))
    ranked.groupBy(col("l_partkey").as("product_id"), col("position_bucket"))
      .agg(
        count(lit(1)).as("purchase_count"),
        rnd(avg(col("l_quantity")), 4).as("avg_quantity"),
        rnd(avg(col("prev_was_return").cast("double")), 4).as("prev_return_rate"))
      .filter(col("purchase_count") >= minPurchases) // HAVING (P8)
      .orderBy(col("product_id"), col("position_bucket"))
  }
}
