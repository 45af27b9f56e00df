package graft.layers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Tables, InstacartSchemas}
import graft.quality.Gates
import graft.ops.RelationalOps._

/** The reference's medallion pipeline (Bronze → Silver → Gold) end-to-end,
  * on the Instacart-shaped schemas — the workload semantics of
  * notebooks/01-03 with the corrected serverless-SQL behavior
  * (SURVEY.md §2.9, §2.11, §3).
  *
  * Deviations from the reference, by design:
  * - Parquet instead of Delta (no Delta jars offline — SURVEY.md §7);
  *   identical overwrite/partitionBy semantics.
  * - Deterministic dedup tie-break (add_to_cart_order / order_number)
  *   instead of `monotonically_increasing_id()` (02_silver_transform.py:50)
  *   which is partition-layout-dependent.
  * - Gates run as ONE profiling scan per table ([[Gates.profile]]) instead
  *   of 2 count-jobs per gate (§3 step 4) — same thresholds, same failure
  *   behavior, ~10× fewer jobs on a 100 TB table.
  */
object Medallion {

  final case class Config(
    rawDir: String, bronzeDir: String, silverDir: String, goldDir: String,
    nullRateDefault: Double = 0.001,     // pipeline_config.yml:14
    nullRateDaysSincePrior: Double = 0.07, // pipeline_config.yml:15
    duplicateRate: Double = 0.0,          // pipeline_config.yml:18-19
    reconDrift: Double = 0.001)           // pipeline_config.yml:23

  /** 01_bronze_ingest: CSV → enforced schema → metadata cols → write;
    * prior+train order_products unioned (01:120-140). */
  def runBronze(spark: SparkSession, cfg: Config): Map[String, Long] = {
    val tables = Seq(
      ("orders", InstacartSchemas.orders, "orders.csv"),
      ("products", InstacartSchemas.products, "products.csv"),
      ("aisles", InstacartSchemas.aisles, "aisles.csv"),
      ("departments", InstacartSchemas.departments, "departments.csv"))
    val counts = tables.map { case (name, schema, file) =>
      val df = Tables.withBronzeMeta(
        Tables.readCsv(spark, s"${cfg.rawDir}/$file", schema), file, "v1")
      Tables.overwrite(df, s"${cfg.bronzeDir}/$name")
      val n = spark.read.parquet(s"${cfg.bronzeDir}/$name").count()
      Gates.assertRowCountNonzero(n, name)
      Gates.logLayerStats("bronze", name, n)
      name -> n
    }.toMap
    // prior + train union (positional, same schema)
    val prior = Tables.readCsv(spark, s"${cfg.rawDir}/order_products_prior.csv",
      InstacartSchemas.orderProducts)
    val train = Tables.readCsv(spark, s"${cfg.rawDir}/order_products_train.csv",
      InstacartSchemas.orderProducts)
    val op = Tables.withBronzeMeta(prior.union(train), "order_products_*.csv", "v1")
    Tables.overwrite(op, s"${cfg.bronzeDir}/order_products")
    val n = spark.read.parquet(s"${cfg.bronzeDir}/order_products").count()
    Gates.assertRowCountNonzero(n, "order_products")
    Gates.logLayerStats("bronze", "order_products", n)
    counts + ("order_products" -> n)
  }

  /** 02_silver_transform: dedup → gates → enrich → reconcile → write. */
  def runSilver(spark: SparkSession, cfg: Config): Map[String, Long] = {
    // --- orders (02:44-98) ---
    val bronzeOrders = Tables.dropBronzeMeta(
      spark.read.parquet(s"${cfg.bronzeDir}/orders"))
    val sourceOrders = bronzeOrders.count()
    val ordersDedup = dedupFirst(bronzeOrders, Seq("order_id"),
      Seq(col("user_id"), col("order_number")))
    // single-scan gate profile (reference runs 4 null gates + dup gate)
    val (nOrders, nullRates) = Gates.profile(ordersDedup,
      Seq("order_id", "user_id", "eval_set", "days_since_prior_order"))
    require(nullRates("order_id") <= cfg.nullRateDefault &&
      nullRates("user_id") <= cfg.nullRateDefault &&
      nullRates("eval_set") <= cfg.nullRateDefault,
      s"null-rate gate breach on orders: $nullRates")
    Gates.checkNullRate(ordersDedup, "days_since_prior_order",
      cfg.nullRateDaysSincePrior, "silver") // valid nulls, loose threshold (02:64-65)
    Gates.checkDuplicateRate(ordersDedup, Seq("order_id"), cfg.duplicateRate)
    val ordersEnriched = ordersDedup.withColumns(Map(
      "is_first_order" -> (col("order_number") === 1),           // 02:72
      "order_day_name" -> dayNameInstacart(col("order_dow")),    // 02:73-79
      "order_time_bucket" -> hourBucket(col("order_hour_of_day")), // 02:80-83
      "_silver_processed_at" -> current_timestamp()))            // 02:84
    Gates.reconcileRowCounts(sourceOrders, nOrders, cfg.reconDrift, "orders")
    Tables.overwrite(ordersEnriched, s"${cfg.silverDir}/orders")

    // --- order_products (02:104-142) ---
    val bronzeOp = Tables.dropBronzeMeta(
      spark.read.parquet(s"${cfg.bronzeDir}/order_products"))
    val sourceOp = bronzeOp.count()
    val opDedup = dedupFirst(bronzeOp, Seq("order_id", "product_id"),
      Seq(col("add_to_cart_order")))
    Gates.checkDuplicateRate(opDedup, Seq("order_id", "product_id"), cfg.duplicateRate)
    // referential integrity: child FKs must exist in silver orders (02:124)
    Gates.checkReferentialIntegrity(opDedup, "order_id",
      spark.read.parquet(s"${cfg.silverDir}/orders"), "order_id")
    val opEnriched = opDedup
      .withColumn("is_reordered", col("reordered") === 1)        // 02:129
      .withColumn("_silver_processed_at", current_timestamp())
    Gates.reconcileRowCounts(sourceOp, opDedup.count(), cfg.reconDrift, "order_products")
    Tables.overwrite(opEnriched, s"${cfg.silverDir}/order_products")

    // --- lookups passed through with metadata (02:148-175) ---
    for (name <- Seq("products", "aisles", "departments")) {
      val df = Tables.dropBronzeMeta(spark.read.parquet(s"${cfg.bronzeDir}/$name"))
        .withColumn("_silver_processed_at", current_timestamp())
      Tables.overwrite(df, s"${cfg.silverDir}/$name")
    }
    Map("orders" -> nOrders, "order_products" -> spark.read.parquet(s"${cfg.silverDir}/order_products").count())
  }

  /** 03_gold_metrics (serverless semantics): fct_orders star join with md5
    * surrogate key, partitioned by eval_set; dim_users with segments. */
  def runGold(spark: SparkSession, cfg: Config): Map[String, Long] = {
    val orders = spark.read.parquet(s"${cfg.silverDir}/orders")
    val op = spark.read.parquet(s"${cfg.silverDir}/order_products")
    val products = spark.read.parquet(s"${cfg.silverDir}/products")
    val aisles = spark.read.parquet(s"${cfg.silverDir}/aisles")
    val departments = spark.read.parquet(s"${cfg.silverDir}/departments")

    // fct_orders (03_serverless:72-121): 4-way star join, broadcast dims
    val fct = op
      .join(orders.drop("_silver_processed_at"), Seq("order_id"))
      .join(broadcast(products.drop("_silver_processed_at")), Seq("product_id"))
      .join(broadcast(aisles.drop("_silver_processed_at")), Seq("aisle_id"))
      .join(broadcast(departments.drop("_silver_processed_at")), Seq("department_id"))
      .withColumn("order_product_key", surrogateKey(col("order_id"), col("product_id")))
      .withColumn("aisle_name", col("aisle"))
      .withColumn("department_name", col("department"))
      .withColumn("_gold_computed_at", current_timestamp())
    // gold snapshots are versioned (time travel + schema gate) — the
    // Delta-table semantics of the reference, on plain Parquet
    graft.sources.VersionedTable.write(fct, s"${cfg.goldDir}/fct_orders",
      allowEvolution = true, partitionBy = Seq("eval_set"))

    // dim_users (03_serverless:124-189)
    val orderStats = op.groupBy(col("order_id")).agg(
      count(lit(1)).as("basket_size"),
      sum(col("reordered")).as("reordered_items"))
      .withColumn("order_reorder_rate",
        rnd(safeDiv(col("reordered_items").cast("double") * 100.0,
          col("basket_size").cast("double")), 0))
    val dimUsers = orders.join(orderStats, Seq("order_id"), "left")
      .groupBy(col("user_id")).agg(
        countDistinct(col("order_id")).as("total_orders"),
        coalesce(sum(col("basket_size")), lit(0L)).as("lifetime_items"),
        rnd(avg(col("basket_size")), 2).as("avg_basket_size"),
        max(col("order_number")).as("max_order_sequence"),
        avg(col("days_since_prior_order")).as("avg_days_between_orders"),
        rnd(avg(col("order_reorder_rate")), 4).as("avg_reorder_rate_pct"))
      .withColumns(Map(
        "frequency_segment" ->                                    // 03_serverless:165-181
          when(col("total_orders") >= 50, "power")
            .when(col("total_orders") >= 20, "regular")
            .when(col("total_orders") >= 5, "occasional").otherwise("new"),
        "basket_segment" ->
          when(col("avg_basket_size") >= 15, "large")
            .when(col("avg_basket_size") >= 8, "medium").otherwise("small"),
        "_gold_computed_at" -> current_timestamp()))
    graft.sources.VersionedTable.write(dimUsers, s"${cfg.goldDir}/dim_users",
      allowEvolution = true)

    Map(
      "fct_orders" -> graft.sources.VersionedTable.readLatest(spark, s"${cfg.goldDir}/fct_orders").count(),
      "dim_users" -> graft.sources.VersionedTable.readLatest(spark, s"${cfg.goldDir}/dim_users").count())
  }

  /** Full pipeline: bronze → silver → gold with gates between layers. */
  def runAll(spark: SparkSession, cfg: Config): Map[String, Long] =
    runBronze(spark, cfg) ++ runSilver(spark, cfg) ++ runGold(spark, cfg)
}
