package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query registries live in graft.queries.*; this object only aggregates
  * them. Every registry key has a same-column-named DuckDB oracle unless
  * the operator is not SQL-expressible (then the driver records a weaker
  * rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full gold star-join (fct grain) rolled up to nation revenue. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    graft.marts.GoldMarts.fctOrderItems(
      t(spark, dir, "lineitem"), t(spark, dir, "orders"), t(spark, dir, "part"),
      t(spark, dir, "customer"), t(spark, dir, "nation"), t(spark, dir, "region"))
      .groupBy(col("region_name"), col("nation_name"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("revenue")), 2).as("revenue"))
      .orderBy(col("region_name"), col("nation_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.LlmQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.SketchQueries.queries ++
      graft.queries.TpchQueries.queries ++
      graft.queries.MvQueries.queries ++
      graft.queries.RecursiveQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracle ++
      graft.queries.LlmQueries.oracle ++
      graft.queries.EventQueries.oracle ++
      graft.queries.CurationQueries.oracle ++
      graft.queries.SketchQueries.oracle ++
      graft.queries.TpchQueries.oracle ++
      graft.queries.MvQueries.oracle ++
      graft.queries.RecursiveQueries.oracle
}
