package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, NumericType, ShortType}

/** Optimizer rule: rewrite a bare interval join
  *
  * {{{ points JOIN intervals ON p BETWEEN lo AND hi }}}
  *
  * into the bucketed equi-join of [[graft.ops.RangeJoin]]. The raw form
  * has no equi-key, so Spark plans BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) comparisons and undistributable once neither
  * side fits a broadcast. The rewrite cuts the value axis into
  * fixed-width buckets (points project their bucket, intervals explode
  * the buckets they overlap), making the match an equi-join on the
  * bucket id plus the original BETWEEN as residual — correct for ANY
  * positive width (bucket agreement is implied by containment, the
  * residual removes bucket-mate false positives), distributed and
  * AQE-skew-splittable like every other equi-join.
  *
  * The bucket width is a semantic hint the optimizer cannot derive at
  * rewrite time (deriving it from the interval-span distribution takes
  * an aggregate over the data; [[graft.ops.RangeJoin.autoBucketWidth]]
  * does exactly that for the API path). Two ways to supply it:
  *
  *  - **Per-join (preferred)**: `df.hint("range_join", w)` on either
  *    join input — [[RangeJoinHintResolution]] resolves it to a
  *    [[graft.functions.RangeJoinWidthHint]] marker predicate inside
  *    that join's subtree, which this rule reads (and strips) when it
  *    fires. Because the marker rides the join's own subtree, two range
  *    joins in one plan can carry two different widths, and concurrent
  *    queries can't cross-contaminate.
  *  - Session conf `spark.graft.rangeJoin.width` (0/unset = off):
  *    the legacy knob, kept as the fallback when no hint is present.
  *    Width is per-join tuning — each interval explodes into
  *    (span/width + 1) bucket rows, so a conf width tuned for one join
  *    can flood (or, past Spark's sequence-length cap, fail) a
  *    different BETWEEN join whose value scale is wildly larger; set it
  *    around the target query and restore, or use the hint.
  *
  * Conservative guards, in the TopKRewrite discipline:
  *  - inner join whose condition is EXACTLY the two range conjuncts
  *    (any conjunct order, any comparison orientation); extra conjuncts
  *    — including an equi-key that would already avoid the BNLJ — leave
  *    the join untouched;
  *  - point and both bounds are bare numeric ATTRIBUTES, the point from
  *    one side and both bounds from the other (expressions would need
  *    provably-deterministic duplication into the bucket columns);
  *  - strict bounds are not matched (BETWEEN is inclusive; rewriting
  *    `<` would change semantics).
  * Idempotent: the rewritten join's condition carries the added bucket
  * equality, so the exactly-two-conjuncts guard cannot re-fire on it.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthKey = "spark.graft.rangeJoin.width"

  private def width: Long =
    try conf.getConfString(WidthKey, "0").toLong catch { case _: NumberFormatException => 0L }

  /** One reading of a comparison as "point vs bound". `a <= b` is
    * ambiguous in isolation — it reads as point `a` under upper bound
    * `b` OR bound `a` under point `b` — so every comparison yields BOTH
    * interpretations and [[matchRange]] searches for the consistent
    * pair. */
  private case class Bound(point: Attribute, bound: Attribute, isLower: Boolean)

  /** Unwrap an operand to its attribute, looking through WIDENING
    * numeric casts only — type coercion wraps the narrower side of a
    * mixed-width comparison in a cast (e.g. `cast(p as bigint) <= hi`
    * for an int point against long bounds), and integral widening /
    * float→double are exact and strictly monotone, so comparing in the
    * widened space orders identically to the raw values and bucketing
    * the RAW attribute preserves containment. A narrowing cast (user-
    * written) can wrap on overflow — not monotone — so it declines. */
  private def operand(e: Expression): Option[Attribute] = e match {
    case a: Attribute => Some(a)
    case Cast(a: Attribute, t, _, _) if widens(a.dataType, t) => Some(a)
    case _ => None
  }

  private val intWidths = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
  private def widens(f: DataType, t: DataType): Boolean = {
    val (i, j) = (intWidths.indexOf(f), intWidths.indexOf(t))
    if (i >= 0 && j >= 0) i <= j
    else (f == FloatType && t == DoubleType) || f == t
  }

  private def interps(e: Expression): Seq[Bound] = e match {
    case GreaterThanOrEqual(l, r) =>
      (operand(l), operand(r)) match {
        case (Some(a), Some(b)) =>
          Seq(Bound(a, b, isLower = true), Bound(b, a, isLower = false))
        case _ => Seq.empty
      }
    case LessThanOrEqual(l, r) =>
      (operand(l), operand(r)) match {
        case (Some(a), Some(b)) =>
          Seq(Bound(a, b, isLower = false), Bound(b, a, isLower = true))
        case _ => Seq.empty
      }
    case _ => Seq.empty
  }

  /** The matched shape: point attr, lo, hi, and whether points are the
    * left side. Both orderings of the conjuncts and both orientations of
    * each comparison are accepted; the SAME attribute must be the point
    * of both conjuncts, and sides must split point-vs-bounds. */
  private def matchRange(cond: Expression, left: LogicalPlan,
                         right: LogicalPlan): Option[(Attribute, Attribute, Attribute, Boolean)] =
    cond match {
      case And(c1, c2) =>
        (for {
          b1 <- interps(c1)
          b2 <- interps(c2)
          if b1.point.semanticEquals(b2.point) && b1.isLower != b2.isLower
          lo = if (b1.isLower) b1.bound else b2.bound
          hi = if (b1.isLower) b2.bound else b1.bound
          if Seq(b1.point, lo, hi).forall(_.dataType.isInstanceOf[NumericType])
          pointsLeft <-
            if (left.outputSet.contains(b1.point) &&
              right.outputSet.contains(lo) && right.outputSet.contains(hi)) Seq(true)
            else if (right.outputSet.contains(b1.point) &&
              left.outputSet.contains(lo) && left.outputSet.contains(hi)) Seq(false)
            else Seq.empty
        } yield (b1.point, lo, hi, pointsLeft)).headOption
      case _ => None
    }

  /** lo ≤ hi with the coercion cast the analyzer would have inserted —
    * this plan is built AFTER analysis, so mixed-width operands must be
    * widened explicitly or the node re-validates as unresolved. */
  private def mkLE(a: Expression, b: Expression): Expression =
    if (a.dataType == b.dataType) LessThanOrEqual(a, b)
    else if (widens(a.dataType, b.dataType)) LessThanOrEqual(Cast(a, b.dataType), b)
    else if (widens(b.dataType, a.dataType)) LessThanOrEqual(a, Cast(b, a.dataType))
    else LessThanOrEqual(Cast(a, DoubleType), Cast(b, DoubleType))

  /** floor(e / width) as a long — double division then floor, the same
    * arithmetic as RangeJoin.rangeJoin; IEEE division is monotone, so
    * containment still implies bucket-range membership and no match can
    * be lost to rounding. */
  private def bucketOf(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  /** First hint-marker width in a join input's subtree, searching only
    * DOWN TO the nearest nested Join: filters never migrate ABOVE their
    * join, so a marker below this side but above any nested join was
    * hinted for THIS join — while a marker inside a nested join's own
    * subtree belongs to that join (consumed there if its shape matched;
    * deliberately ignored here if it didn't, so an unmatched hint can
    * never leak a width tuned for one value axis onto another join). */
  private def hintWidth(side: LogicalPlan): Option[Long] = side match {
    case _: Join => None
    case f: Filter =>
      f.condition.collectFirst { case graft.functions.RangeJoinWidthHint(w) => w }
        .orElse(hintWidth(f.child))
    case other => other.children.view.flatMap(hintWidth).headOption
  }

  /** Remove marker predicates from a subtree, to the same nested-Join
    * boundary [[hintWidth]] searches (the hint is consumed by the
    * rewrite; a leftover marker would cost nothing but clutter the
    * plan). A Filter reduced to nothing disappears entirely. */
  private def stripHints(side: LogicalPlan): LogicalPlan = side match {
    case j: Join => j
    case f: Filter =>
      val kept = splitConjunctivePredicates(f.condition)
        .filterNot(_.isInstanceOf[graft.functions.RangeJoinWidthHint])
      val child = stripHints(f.child)
      if (kept.isEmpty) child else Filter(kept.reduce(And), child)
    case other => other.mapChildren(stripHints)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val confW = width
    // cheap no-op path: with the conf off and no marker anywhere in the
    // plan, skip entirely — this rule sits in a fixed-point batch and
    // must cost ~nothing for the (overwhelmingly common) unhinted query
    if (confW <= 0 && !plan.exists {
      case f: Filter =>
        f.condition.exists(_.isInstanceOf[graft.functions.RangeJoinWidthHint])
      case _ => false
    }) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if hintWidth(left).orElse(hintWidth(right)).getOrElse(confW) > 0 =>
        val w = hintWidth(left).orElse(hintWidth(right)).getOrElse(confW)
        matchRange(cond, left, right) match {
          case Some((p, lo, hi, pointsLeft)) =>
            val points = stripHints(if (pointsLeft) left else right)
            val intervals = stripHints(if (pointsLeft) right else left)
            val pAlias = Alias(bucketOf(p, w), "__bucket_p")()
            val pSide = Project(points.output :+ pAlias, points)
            val bAttr = AttributeReference("__bucket_i", LongType)()
            // Sequence is TimeZoneAwareExpression: the analyzer's
            // ResolveTimeZone pass already ran, so the id must be set
            // here or the node stays unresolved
            val iSide = Generate(
              Explode(Sequence(bucketOf(lo, w), bucketOf(hi, w), None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bAttr),
              child = Filter(mkLE(lo, hi), intervals))
            val newCond = And(EqualTo(pAlias.toAttribute, bAttr), cond)
            val rewritten =
              if (pointsLeft) Join(pSide, iSide, Inner, Some(newCond), hint)
              else Join(iSide, pSide, Inner, Some(newCond), hint)
            Project(j.output, rewritten)
          case None => j
        }
    }
  }
}
