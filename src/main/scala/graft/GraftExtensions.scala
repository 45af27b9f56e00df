package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Production registration of the engine's Catalyst extensions — the
  * mechanism a cluster deployment uses:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Injects the [[org.apache.spark.sql.graft.GroupedTopKStrategy]] planner
  * strategy (so [[graft.plans.GroupedTopK]] plans without any per-session
  * `experimental.extraStrategies` mutation), the [[graft.plans.TopKRewrite]]
  * optimizer rule (declarative `row_number + filter + drop` top-k idioms
  * compile into the bounded-heap operator automatically), the
  * [[graft.plans.RangeJoinRewrite]] rule (bare `p BETWEEN lo AND hi` joins
  * compile into the bucketed equi-join when
  * `spark.graft.rangeJoin.width` is set), the
  * [[graft.plans.MetaAggRewrite]] rule (global `count`/`min`/`max`
  * aggregates over gvt relations answer from footer/zone-map metadata
  * — zero tasks), the [[graft.plans.GvtDml]]
  * rule (SQL `DELETE FROM` / `UPDATE` / `MERGE INTO` over gvt
  * relations route to the versioned-commit APIs), and every native
  * function from [[graft.functions.NativeFunctions]] as a built-in
  * (available in SQL text and `call_function` from session start, no
  * register() call needed).
  *
  * The imperative paths (`NativeFunctions.register`, the self-registering
  * `GroupedTopKApi.groupedTopK`) remain for ad-hoc sessions the caller did
  * not configure; both consume the same builder/strategy objects, so the
  * two mechanisms cannot drift. ExtensionsSpec proves a session configured
  * ONLY via this class plans GroupedTopK and resolves the SQL functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.GroupedTopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.MetaAggRewrite)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    ext.injectHintResolutionRule(_ => graft.plans.RangeJoinHintResolution)
    ext.injectResolutionRule(_ => graft.plans.GvtInsertGuard)
    ext.injectResolutionRule(_ => graft.plans.GvtDml)
    ext.injectParser((session, delegate) =>
      new graft.plans.GvtSqlParser(session, delegate))
    for ((name, builder) <- graft.functions.NativeFunctions.builders)
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    // Delta's CDF SQL surface: SELECT * FROM table_changes(t, from, to, keys)
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "table_changes"),
      graft.plans.GvtTableChanges.builder))
  }
}
