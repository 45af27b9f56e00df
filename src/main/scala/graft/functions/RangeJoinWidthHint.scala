package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Per-join carrier for the range-join bucket width
  * ([[graft.plans.RangeJoinRewrite]]): a boolean that always evaluates
  * TRUE, planted as a `Filter` on the hinted join input by
  * [[graft.plans.RangeJoinHintResolution]]. Riding the plan as an
  * ordinary predicate is what makes the width PER-JOIN: it stays inside
  * its join's subtree through pushdown/fixed-point optimization (filters
  * never move above their join), so two range joins in ONE plan can
  * carry two different widths — impossible with the session-conf knob,
  * which cross-contaminates concurrent queries (the footgun documented
  * at RangeJoinRewrite's operational note).
  *
  * Non-foldable (leaf default) so constant folding can't erase it before
  * the rewrite reads it; deterministic, so it remains legal anywhere a
  * join condition or filter predicate is. If a plan shape the rewrite
  * doesn't match leaves it behind, it codegens to a literal `true` —
  * zero cost inside whole-stage codegen. */
case class RangeJoinWidthHint(width: Long) extends LeafExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = code"", isNull = FalseLiteral, value = TrueLiteral)
  override def prettyName: String = "range_join_width"
}
