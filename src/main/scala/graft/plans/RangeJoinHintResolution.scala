package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Analyzer hint-resolution rule (SparkSessionExtensions
  * `injectHintResolutionRule`): resolves
  *
  * {{{ intervals.hint("range_join", 100L) }}}
  *
  * (and the SQL hint-comment form `RANGE_JOIN(100)`, which parses to the
  * same UnresolvedHint node)
  * into `Filter(RangeJoinWidthHint(100), intervals)` — the per-join width
  * carrier [[RangeJoinRewrite]] reads, replacing the session-conf knob
  * for concurrent-query safety. Mirrors the public range-join hint API
  * of commercial Spark runtimes: the hint goes on either input of the
  * `p BETWEEN lo AND hi` join, the width is in the value axis' units.
  *
  * Unrecognized hint names pass through untouched (Spark's own
  * ResolveJoinStrategyHints / warn-and-drop machinery handles them);
  * a RANGE_JOIN hint with a non-integral parameter is left unresolved
  * rather than silently mis-tuned, so Spark's unrecognized-hint warning
  * fires and the join still executes (as BNLJ). */
object RangeJoinHintResolution extends Rule[LogicalPlan] {

  private val Names = Set("RANGE_JOIN", "RANGE_JOIN_WIDTH")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedHint(name, Seq(w), child) if Names(name.toUpperCase) =>
      w match {
        case Literal(v: Int, IntegerType) if v > 0 =>
          Filter(graft.functions.RangeJoinWidthHint(v.toLong), child)
        case Literal(v: Long, LongType) if v > 0 =>
          Filter(graft.functions.RangeJoinWidthHint(v), child)
        case _ => UnresolvedHint(name, Seq(w), child)
      }
  }
}
