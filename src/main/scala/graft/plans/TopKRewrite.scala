package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the standard per-group top-k idiom
  *
  * {{{ Project(cols without rn,
  *       Filter(rn <= k,
  *         Window(row_number() over (partition by g order by o) AS rn))) }}}
  *
  * into [[GroupedTopK]] — the bounded-heap operator whose partial pass
  * ships at most k rows per (key, input-partition) instead of shuffling
  * every row into a full per-group sort (see GroupedTopK's scaladoc for
  * the 100 TB arithmetic). Users keep writing the declarative
  * window-dedup idiom; sessions carrying [[graft.GraftExtensions]] plan
  * it into the custom operator automatically.
  *
  * Deliberately CONSERVATIVE — it fires only when the rewrite is
  * provably equivalent, and leaves anything else untouched:
  *  - exactly one window expression, and it is `row_number()` (rank/
  *    dense_rank admit ties — a bounded heap of k rows would drop them);
  *  - the filter is a sole `rn <= lit` / `rn < lit` / `rn = 1`
  *    comparison (no And: other conjuncts might legally sit below the
  *    window but this rule does not prove it);
  *  - the projection discards the rank column (GroupedTopK does not
  *    produce it) and references only the window child's output;
  *  - k ≥ 1 after normalizing `<` to `<=` (k ≤ 0 selects nothing — left
  *    for the engine's empty-relation folding, not this rule);
  *  - the window has at least one partition key: a global top-k without
  *    keys is Spark's TakeOrderedAndProject territory already.
  *
  * Idempotent by construction (the rewrite removes the Window node it
  * matched), so it is safe in a fixed-point optimizer batch. Injected by
  * [[graft.GraftExtensions]] together with the planner strategy that
  * executes the logical node; TopKRewriteSpec covers the positive
  * rewrite, result equality, and every guard's negative case.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** (rank attribute, k) when the predicate is a sole rn-bound. */
  private def rankBound(cond: Expression): Option[(Attribute, Int)] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) => Some((a, k))
    case LessThan(a: Attribute, Literal(k: Int, _)) => Some((a, k - 1))
    case EqualTo(a: Attribute, Literal(1, _)) => Some((a, 1))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)),
          _)), _, _, child, _))) =>
      rankBound(cond) match {
        case Some((rnAttr, k))
            if k >= 1 && part.nonEmpty &&
              w.windowOutputSet.contains(rnAttr) &&
              !projectList.exists(_.references.contains(rnAttr)) &&
              projectList.forall(_.references.subsetOf(child.outputSet)) =>
          Project(projectList, GroupedTopK(part, order, k, child))
        case _ => p
      }
  }
}
