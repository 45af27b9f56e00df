package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.NativeColumns
import graft.sources.VersionedTable
import graft.sources.gvt.{GvtDvRelation, GvtFileIndex}

/** SQL DML over gvt relations — the surface the reference's
  * authoritative notebook actually writes (pure SQL,
  * 03_gold_metrics_serverless.py:78-371) and Delta's users expect:
  *
  *   DELETE FROM t WHERE p
  *   UPDATE t SET c = e, … WHERE p
  *   MERGE [WITH SCHEMA EVOLUTION] INTO t USING s ON t.k = s.k
  *     WHEN MATCHED [AND c] THEN DELETE
  *     WHEN MATCHED [AND c] THEN UPDATE SET c = e, … | UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT * | INSERT (cols…) VALUES (s.cols…)
  *     WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE | UPDATE SET …
  *
  * Spark parses these into `DeleteFromTable` / `UpdateTable` /
  * `MergeIntoTable`, which only DataSourceV2 tables implement; this
  * resolution rule (injected by [[graft.GraftExtensions]]) intercepts
  * the RESOLVED plans whose target is a gvt relation and rewrites them
  * into eager commands routing to the versioned-commit APIs:
  * DELETE → [[VersionedTable.deleteWhereVector]] and
  * UPDATE → [[VersionedTable.updateWhereVector]] (both O(changed)
  * deletion-vector commits, zone-map-pruned locate scans);
  * MERGE → [[VersionedTable.mergeInto]] (one key-partitioned join,
  * conditional-commit retry).
  *
  * Boundaries (all fail LOUDLY, never silently mis-execute):
  * time-travel-pinned relations are read-only; conditions must be
  * subquery-free; MERGE's ON clause must be a conjunction of
  * target-column = source-column equalities; a conditional UPDATE must
  * be the LAST clause of its group (per-row fall-through to a later
  * clause is not expressible in the one-join merge); an INSERT column
  * list must be equivalent to INSERT *.
  *
  * Snapshot note: a `CREATE TEMP VIEW … USING gvt` pins its snapshot
  * at (re)creation — after DML, re-create or
  * `spark.catalog.refreshTable` the view to see the new version, the
  * same re-resolve contract the gvt read surface documents. */
object GvtDml extends Rule[LogicalPlan] {

  /** A gvt DML target: the table root + whether the relation was
    * explicitly version-pinned (versionAsOf/timestampAsOf). */
  private object GvtTarget {
    def unapply(plan: LogicalPlan): Option[(String, Boolean)] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case v: View => unapply(v.child)
      case LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if r.location.isInstanceOf[GvtFileIndex] =>
        val idx = r.location.asInstanceOf[GvtFileIndex]
        if (idx.tableRoot.isEmpty) None else Some((idx.tableRoot, idx.pinned))
      case LogicalRelation(r: GvtDvRelation, _, _, _, _) =>
        Some((r.root, r.pinned))
      // GvtMergeEvolution's parse-time widening: the table plus typed
      // NULLs for the source's new columns — row-set-preserving by
      // construction (attributes and null literals only), so the DML
      // target is still the table
      case Project(pl, child) if pl.forall {
        case _: AttributeReference => true
        case org.apache.spark.sql.catalyst.expressions.Alias(l: Literal, _) =>
          l.value == null
        case _ => false
      } => unapply(child)
      case _ => None
    }
  }

  /** Exposed for [[GvtSqlParser]]'s maintenance commands and
    * [[GvtTimeTravel]]: the gvt root (+ pinned flag) of an analyzed
    * plan, if it is a gvt relation. */
  private[plans] def gvtRootOf(plan: LogicalPlan): Option[(String, Boolean)] =
    GvtTarget.unapply(plan)

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"gvt SQL DML: $what is not supported — use the VersionedTable API " +
        "(deleteWhereVector/updateWhereVector/mergeInto) for the full surface")

  private def requireLive(pinned: Boolean, op: String): Unit =
    if (pinned) throw new UnsupportedOperationException(
      s"$op over a time-travel-pinned gvt relation: historical snapshots " +
        "are read-only — address the live table (no versionAsOf/timestampAsOf)")

  /** Resolved condition → Column over a FRESH read of the table:
    * attribute references drop their exprIds/qualifiers and re-resolve
    * by name (the predicate reaches [[VersionedTable.predicateRanges]]
    * and the residual filter identically to an API-built Column). */
  private def toCol(e: Expression): Column = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      unsupported("a subquery in a DML condition")
    toColUnchecked(e)
  }

  /** Inline `With` common-expression nodes (the analyzer's BETWEEN /
    * case-dedup rewrite) by substituting each ref with its definition:
    * `With.withNewChildrenInternal` calls dataType on its defs, which
    * explodes once the attribute rewrite below makes them unresolved —
    * and a DML condition is evaluated ONCE per row anyway, so the
    * dedup buys nothing here. */
  private def inlineWith(e: Expression): Expression = e.transformUp {
    case w: org.apache.spark.sql.catalyst.expressions.With =>
      val defs = w.defs.map(d => d.id -> d.child).toMap
      w.child.transformUp {
        case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef
            if defs.contains(r.id) => defs(r.id)
      }
  }

  private def toColUnchecked(e: Expression): Column =
    NativeColumns.ofExpr(inlineWith(e).transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })

  /** [[toColUnchecked]] for run-time callers ([[SubqueryConds]]'s
    * scalar fold). */
  private[plans] def exprToColumn(e: Expression): Column = toColUnchecked(e)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** One subquery-shaped top-level conjunct of a DELETE/UPDATE
    * condition, carried to run time (the subquery plan must execute at
    * COMMAND time, inside the locate scan, never during resolution). */
  private[plans] sealed trait SubCond
  /** `(v…) [NOT] IN (SELECT …)` — or a correlated `[NOT] EXISTS` /
    * `NOT IN` decomposed to its equality keys. `notIn3VL` selects the
    * negated join's semantics: SQL NOT IN's three-valued null poison
    * (true) vs NOT EXISTS's plain anti-join (false). `corrKeys` =
    * number of TRAILING columns of `values` that are decorrelated
    * equality keys (plain `=` semantics — a NULL key means the row's
    * subquery set is empty, not poisoned). */
  private[plans] case class InCond(values: Seq[Column], plan: LogicalPlan,
                                   negated: Boolean,
                                   notIn3VL: Boolean = true,
                                   corrKeys: Int = 0,
                                   residuals: Seq[Column => Column] =
                                     Seq.empty) extends SubCond
  /** Uncorrelated `[NOT] EXISTS (SELECT …)` — a run-time constant. */
  private[plans] case class ExistsCond(plan: LogicalPlan,
                                       negated: Boolean) extends SubCond

  /** Decompose a CORRELATED subquery plan whose every outer reference
    * is a top-level `outer-column = inner-expression` equality conjunct
    * in the Filter pipeline directly under the subquery's projection —
    * the staging-table idiom `EXISTS (SELECT … FROM s WHERE s.k = t.k)`
    * — into (outer key Columns, a decorrelated plan whose TRAILING
    * output columns are the matching inner expressions). `keepOutput`
    * keeps the subquery's own projection in front (the correlated IN
    * shape, whose values the caller pairs positionally); EXISTS drops
    * it. Anything richer (correlation under an aggregate/join, non-
    * equality correlation, outer refs in the projection) refuses
    * LOUDLY — never a silent mis-execution. */
  private def hasOuter(e: Expression): Boolean =
    e.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.OuterReference])
  private def planHasOuter(p: LogicalPlan): Boolean =
    p.exists(_.expressions.exists(hasOuter))

  /** A non-equality correlated conjunct admitted by
    * [[stripEqCorrelation]]: a binary comparison with one OUTER-only
    * side and one INNER-only side (`s.ts > t.ts` — the staging
    * freshness idiom). Rides the locate join's condition: `rebuild`
    * reconstructs the comparison over (outer expression stripped of
    * its OuterReferences, the inner expression's projected column). */
  private[plans] case class ResidualCmp(outer: Expression, inner: Expression,
                                        rebuild: (Expression, Expression)
                                          => Expression)

  /** Collect every top-level `outer-column = inner-expression`
    * equality conjunct from `body`'s Filter pipeline — plus (when
    * `allowResiduals`) one-side-outer/one-side-inner binary
    * comparisons as residual join conditions — returning the pairs,
    * residuals, and the pipeline with them removed. Refuses loudly on
    * any other outer-referencing predicate or on residual outer
    * references — the shared core of every correlated-subquery
    * decomposition here. */
  private def stripEqCorrelation(body: LogicalPlan,
                                 allowResiduals: Boolean = false)
      : (Seq[(AttributeReference, Expression)], Seq[ResidualCmp],
         LogicalPlan) = {
    import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, OuterReference}
    val pairs = scala.collection.mutable.ArrayBuffer
      .empty[(AttributeReference, Expression)]
    val residuals = scala.collection.mutable.ArrayBuffer.empty[ResidualCmp]
    // no BARE (inner) attribute anywhere — attrs under an
    // OuterReference wrapper don't count
    def outerOnly(e: Expression): Boolean = {
      def hasInnerAttr(x: Expression): Boolean = x match {
        case _: OuterReference => false
        case _: AttributeReference => true
        case other => other.children.exists(hasInnerAttr)
      }
      !hasInnerAttr(e)
    }
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
        val (corr, local) = conjuncts(cond).partition(hasOuter)
        corr.foreach {
          case EqualTo(OuterReference(a: AttributeReference), inner)
              if !hasOuter(inner) => pairs += ((a, inner))
          case EqualTo(inner, OuterReference(a: AttributeReference))
              if !hasOuter(inner) => pairs += ((a, inner))
          case cmp: BinaryComparison if allowResiduals &&
              hasOuter(cmp.left) && outerOnly(cmp.left) &&
              !hasOuter(cmp.right) =>
            residuals += ResidualCmp(stripOuterRefs(cmp.left), cmp.right,
              (o, i) => cmp.withNewChildren(Seq(o, i)))
          case cmp: BinaryComparison if allowResiduals &&
              hasOuter(cmp.right) && outerOnly(cmp.right) &&
              !hasOuter(cmp.left) =>
            residuals += ResidualCmp(stripOuterRefs(cmp.right), cmp.left,
              (o, i) => cmp.withNewChildren(Seq(i, o)))
          case other => unsupported("a correlated DML subquery predicate " +
            "beyond outer-column = inner-expression equality or a " +
            s"one-side-outer comparison ($other)")
        }
        val sc = strip(child)
        local.reduceOption(CAnd(_, _))
          .map(org.apache.spark.sql.catalyst.plans.logical.Filter(_, sc))
          .getOrElse(sc)
      case other => other
    }
    val stripped = strip(body)
    if (pairs.isEmpty || planHasOuter(stripped))
      unsupported("a correlated DML subquery whose correlation is not a " +
        "top-level equality conjunct over the subquery's own filter " +
        "pipeline (disjunctive/nested correlation does not decompose " +
        "into a distributed locate join" +
        (if (pairs.isEmpty && residuals.nonEmpty)
           "; a residual comparison needs at least one EQUALITY key to " +
             "join on" else "") + ")")
    (pairs.toSeq, residuals.toSeq, stripped)
  }

  /** An outer-only expression with its OuterReference wrappers peeled —
    * the form that resolves by name against the LOCATE SCAN side of
    * the join. */
  private def stripOuterRefs(e: Expression): Expression = e.transform {
    case org.apache.spark.sql.catalyst.expressions
      .OuterReference(a: AttributeReference) => a
  }

  private def decorrelateEq(plan0: LogicalPlan, keepOutput: Boolean)
      : (Seq[Column], LogicalPlan, Seq[Column => Column]) = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    val (projList, body) = plan0 match {
      case Project(pl, child) if !pl.exists(hasOuter) => (pl, child)
      case other => (Seq.empty, other)
    }
    val (pairs, residuals, stripped) =
      stripEqCorrelation(body, allowResiduals = true)
    val aliases = pairs.zipWithIndex.map { case ((_, in), i) =>
      Alias(in, s"__gvt_corr_$i")() }
    // residual inner expressions ride as TRAILING projected columns;
    // each builder reconstructs its comparison over (the outer side
    // resolved by name against the locate scan, the handed-in inner
    // column) at join-condition time
    val resAliases = residuals.zipWithIndex.map { case (r, i) =>
      Alias(r.inner, s"__gvt_res_$i")() }
    val builders: Seq[Column => Column] = residuals.map { r =>
      val outerUnresolved = r.outer.transform {
        case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
      }
      (inner: Column) => NativeColumns.ofExpr(
        r.rebuild(outerUnresolved, NativeColumns.toExpr(inner)))
    }
    val keep: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression] =
      if (keepOutput) projList else Seq.empty
    (pairs.map { case (a, _) => toColUnchecked(a) },
      Project(keep ++ aliases ++ resAliases, stripped),
      builders)
  }

  /** A decorrelated AGGREGATED scalar subquery: join `plan`
    * ([value, matched, keys…], ≤1 row per key group by construction)
    * LEFT onto the locate scan on `keys`; references in the enclosing
    * expression become `If(isnull(matched), onEmpty, value)` — exact
    * SQL scalar semantics including COUNT's 0-on-empty-group. */
  private[plans] case class CorrScalar(out: String, keys: Seq[Column],
                                       plan: LogicalPlan)

  /** Decompose `(SELECT <agg-expr> FROM s WHERE s.k = t.k AND …)` —
    * a GLOBAL aggregate whose correlation is top-level equality in the
    * pipeline BELOW it — into a per-key aggregate plan plus the
    * substitute expression for the enclosing conjunct/assignment.
    * `idx` names the joined columns. The aggregate expression may sit
    * inside deterministic scaffolding (casts, arithmetic); the
    * on-empty value is the scaffolding evaluated with COUNT→0 and
    * every other aggregate→NULL (what the original scalar returns for
    * an empty key group). A NON-aggregated correlated scalar can
    * yield several rows per key and refuses loudly. */
  private def decorrelateScalarAgg(plan0: LogicalPlan, idx: Int)
      : (CorrScalar, Expression) = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, If, IsNull, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val agg = plan0 match {
      case a: Aggregate => a
      case Project(Seq(_: AttributeReference), a: Aggregate) => a
      // a BARE correlated scalar decomposes too — with the standard
      // more-than-one-row runtime guard riding the per-key aggregate
      case _ => return decorrelateScalarBare(plan0, idx)
    }
    if (agg.groupingExpressions.nonEmpty)
      unsupported("a correlated scalar subquery with its own GROUP BY " +
        "(returns one row per ITS groups, not per outer key)")
    val valueAlias = agg.aggregateExpressions match {
      case Seq(al @ Alias(e, _)) if !hasOuter(e) &&
          e.collect { case ae: AggregateExpression => ae }.forall {
            ae => !ae.isDistinct && ae.filter.isEmpty &&
              (ae.aggregateFunction match {
                case _: Sum | _: Count | _: Min | _: Max | _: Average => true
                case _ => false
              })
          } => al
      case other => unsupported("a correlated scalar aggregate beyond " +
        s"sum/count/min/max/avg under deterministic scaffolding ($other)")
    }
    if (!valueAlias.child.deterministic)
      unsupported("a non-deterministic correlated scalar subquery")
    val (pairs, _, stripped) = stripEqCorrelation(agg.child)
    val keyAliases = pairs.zipWithIndex.map { case ((_, in), i) =>
      Alias(in, s"__gvt_csk_$i")() }
    val out = s"__gvt_cs_$idx"
    val decorrelated = Aggregate(pairs.map(_._2),
      Alias(valueAlias.child, out)() +:
        Alias(Literal(true), s"${out}_m")() +: keyAliases,
      stripped)
    // the value of the original scalar over an EMPTY key group: the
    // scaffolding with COUNT→0 and null-on-empty aggregates→NULL,
    // folded to a literal
    val onEmptyExpr = valueAlias.child.transform {
      case ae: AggregateExpression => ae.aggregateFunction match {
        case _: Count => Literal(0L)
        case f => Literal.create(null, f.dataType)
      }
    }
    val onEmpty = Literal.create(onEmptyExpr.eval(
      org.apache.spark.sql.catalyst.InternalRow.empty), onEmptyExpr.dataType)
    val substitute: Expression = If(
      IsNull(UnresolvedAttribute(Seq(s"${out}_m"))),
      onEmpty, UnresolvedAttribute(Seq(out)))
    (CorrScalar(out, pairs.map { case (a, _) => toColUnchecked(a) },
      decorrelated), substitute)
  }

  /** Decompose a NON-aggregated correlated scalar —
    * `(SELECT s.v FROM s WHERE s.k = t.k [AND …])` — into a per-key
    * aggregate that passes the single value through and RAISES the
    * standard more-than-one-row error (naming the offending key) when
    * a key group holds several rows: exact SQL scalar-subquery
    * semantics (0 rows → NULL, 1 row → the value, >1 → runtime
    * error), evaluated as one distributed locate join — the guard is
    * a per-key COUNT riding the same aggregate, never a driver-side
    * check. */
  private def decorrelateScalarBare(plan0: LogicalPlan, idx: Int)
      : (CorrScalar, Expression) = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Coalesce, Concat, GreaterThan, If, IsNull, Literal, NamedExpression, RaiseError}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Max}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.StringType
    val (valueExpr, body) = plan0 match {
      case Project(Seq(ne), child) if !hasOuter(ne) && ne.deterministic =>
        (ne, child)
      case other => unsupported("a correlated scalar subquery whose " +
        "select list is not a single deterministic expression " +
        s"($other)")
    }
    val (pairs, _, stripped) = stripEqCorrelation(body)
    val out = s"__gvt_cs_$idx"
    val valCol: Expression = valueExpr match {
      case al: Alias => al.child
      case e => e
    }
    val keyAliases = pairs.zipWithIndex.map { case ((_, in), i) =>
      Alias(in, s"__gvt_csk_$i")() }
    val proj = Project(Alias(valCol, s"${out}_v")() +: keyAliases, stripped)
    val vAttr = proj.output.head
    val keyAttrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      proj.output.tail
    val cnt = Count(Literal(1)).toAggregateExpression()
    val keyStr: Expression =
      if (keyAttrs.isEmpty) Literal("")
      else Concat(keyAttrs.zipWithIndex.flatMap { case (k, i) =>
        (if (i > 0) Seq(Literal(", ")) else Seq.empty[Expression]) :+
          Coalesce(Seq(Cast(k, StringType), Literal("NULL")))
      })
    val msg = Concat(Seq(
      Literal("gvt SQL DML: a correlated scalar subquery returned " +
        "more than one row for outer key ("), keyStr, Literal(")")))
    val guarded = If(GreaterThan(cnt, Literal(1L)),
      Cast(RaiseError(msg), valCol.dataType),
      Max(vAttr).toAggregateExpression())
    val decorrelated = Aggregate(keyAttrs,
      Alias(guarded, out)() +: Alias(Literal(true), s"${out}_m")() +:
        keyAttrs.map(a => a: NamedExpression),
      proj)
    val substitute: Expression = If(
      IsNull(UnresolvedAttribute(Seq(s"${out}_m"))),
      Literal.create(null, valCol.dataType),
      UnresolvedAttribute(Seq(out)))
    (CorrScalar(out, pairs.map { case (a, _) => toColUnchecked(a) },
      decorrelated), substitute)
  }

  /** Split a resolved DELETE/UPDATE condition into (residual
    * subquery-free predicate, locate-join conjuncts, deferred
    * scalar-subquery conjuncts). Supported shapes — exactly the ones a
    * distributed semi/anti join (or a run-time constant) expresses
    * faithfully:
    *  - a TOP-LEVEL conjunct `expr [NOT] IN (subquery)` — uncorrelated
    *    or correlated by top-level equality; uncorrelated multi-column
    *    NOT IN rides the exact-3VL compatibility anti-join, correlated
    *    NOT IN the null-probe anti-join on its equality keys;
    *  - a top-level conjunct `[NOT] EXISTS (subquery)` — uncorrelated
    *    (a run-time constant) or correlated by top-level equality (a
    *    semi/anti locate join, EXISTS null semantics);
    *  - any conjunct whose only subqueries are UNCORRELATED SCALARS —
    *    evaluated once at command time (at most one row) and folded as
    *    literals.
    * Everything else containing a subquery (non-equality or
    * aggregating correlation, disjunctions across subqueries) refuses
    * LOUDLY — never a silent mis-execution. */
  private def splitSubqueries(cond: Expression,
                              corrScalars: scala.collection.mutable
                                .ArrayBuffer[CorrScalar])
      : (Option[Column], Seq[SubCond], Seq[Expression]) = {
    import org.apache.spark.sql.catalyst.expressions.{Exists, InSubquery, Not, ScalarSubquery}
    def uncorrelated(s: SubqueryExpression): LogicalPlan = {
      if (s.isCorrelated)
        unsupported("a CORRELATED subquery of this shape in a DML " +
          "condition (only equality-correlated IN/EXISTS decompose into " +
          "a distributed locate join)")
      s.plan
    }
    val subs = scala.collection.mutable.ArrayBuffer.empty[SubCond]
    val scalars = scala.collection.mutable.ArrayBuffer.empty[Expression]
    val plain = scala.collection.mutable.ArrayBuffer.empty[Column]
    conjuncts(cond).foreach {
      case in: InSubquery if in.query.isCorrelated =>
        val (corrVals, plan, res) = decorrelateEq(in.query.plan,
          keepOutput = true)
        subs += InCond(in.values.map(toColUnchecked) ++ corrVals, plan,
          negated = false, residuals = res)
      case in: InSubquery =>
        subs += InCond(in.values.map(toColUnchecked), in.query.plan,
          negated = false)
      case Not(in: InSubquery) if in.query.isCorrelated =>
        // correlated NOT IN via the null-probe decomposition: a row is
        // TRUE iff NO subquery row matches its equality keys with a
        // value that is NULL, equal, or paired against a NULL probe —
        // one distributed anti-join on the correlation keys (exact
        // 3VL; see VersionedTable.applyLocateJoins). Non-equality
        // correlation still refuses loudly in decorrelateEq.
        val (corrVals, plan, res) = decorrelateEq(in.query.plan,
          keepOutput = true)
        subs += InCond(in.values.map(toColUnchecked) ++ corrVals, plan,
          negated = true, corrKeys = corrVals.size, residuals = res)
      case Not(in: InSubquery) =>
        subs += InCond(in.values.map(toColUnchecked), uncorrelated(in.query),
          negated = true)
      case ex: Exists if ex.isCorrelated =>
        val (vals, plan, res) = decorrelateEq(ex.plan, keepOutput = false)
        subs += InCond(vals, plan, negated = false, residuals = res)
      case Not(ex: Exists) if ex.isCorrelated =>
        val (vals, plan, res) = decorrelateEq(ex.plan, keepOutput = false)
        subs += InCond(vals, plan, negated = true, notIn3VL = false,
          residuals = res)
      case ex: Exists =>
        subs += ExistsCond(ex.plan, negated = false)
      case Not(ex: Exists) =>
        subs += ExistsCond(ex.plan, negated = true)
      case other if other.exists(_.isInstanceOf[SubqueryExpression]) =>
        // CORRELATED AGGREGATED scalars decompose into per-key locate
        // joins; a conjunct whose remaining subqueries are
        // uncorrelated scalars is deferred whole (each evaluates at
        // command time as one ≤1-row job and folds as a literal)
        val substituted = other.transform {
          case s: ScalarSubquery if s.isCorrelated =>
            val (cs, sub) = decorrelateScalarAgg(s.plan, corrScalars.size)
            corrScalars += cs
            sub
        }
        substituted.foreach {
          case s: SubqueryExpression if !s.isInstanceOf[ScalarSubquery] =>
            unsupported(s"a subquery nested inside a DML condition " +
              s"conjunct ($other) — only top-level [NOT] IN / [NOT] " +
              "EXISTS conjuncts and scalar subqueries decompose")
          case _ => ()
        }
        if (substituted.exists(_.isInstanceOf[SubqueryExpression]))
          scalars += substituted
        else plain += toColUnchecked(substituted)
      case other => plain += toCol(other)
    }
    val residual = plain.reduceOption(_ && _)
    (residual, subs.toSeq, scalars.toSeq)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(GvtTarget(root, pinned), condition) if d.resolved =>
      requireLive(pinned, "DELETE FROM")
      val corrScalars = scala.collection.mutable.ArrayBuffer.empty[CorrScalar]
      val (residual, subs, scalars) = splitSubqueries(condition, corrScalars)
      GvtDeleteCommand(root,
        residual.getOrElse(org.apache.spark.sql.functions.lit(true)),
        subs.collect { case i: InCond => i },
        subs.collect { case e: ExistsCond => e },
        scalarConds = scalars,
        corrScalars = corrScalars.toSeq)

    case u @ UpdateTable(GvtTarget(root, pinned), assignments, condition)
        if u.resolved =>
      requireLive(pinned, "UPDATE")
      val corrScalars = scala.collection.mutable.ArrayBuffer.empty[CorrScalar]
      // assignment values: CORRELATED AGGREGATED scalars decompose
      // into per-key locate joins (`SET x = (SELECT max(v) FROM s
      // WHERE s.k = t.k)`); UNCORRELATED scalars defer whole to
      // command time; plain values resolve to Columns now
      val (plainAssigns, scalarAssigns) = assignments.map { a =>
        val value = a.value.transform {
          case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery
              if s.isCorrelated =>
            val (cs, sub) = decorrelateScalarAgg(s.plan, corrScalars.size)
            corrScalars += cs
            sub
        }
        a.key match {
          case k: AttributeReference
              if value.exists(_.isInstanceOf[SubqueryExpression]) =>
            value.foreach {
              case s: SubqueryExpression if !s.isInstanceOf[
                org.apache.spark.sql.catalyst.expressions.ScalarSubquery] =>
                unsupported(s"a non-scalar subquery in an UPDATE " +
                  s"assignment (${a.value})")
              case _ => ()
            }
            (k.name, Right(value): Either[Column, Expression])
          case k: AttributeReference => (k.name, Left(toColUnchecked(value)))
          case other => unsupported(s"UPDATE of a nested field ($other)")
        }
      }.toMap.partitionMap {
        case (k, Left(c)) => Left(k -> c)
        case (k, Right(e)) => Right(k -> e)
      }
      val (residual, subs, scalars) = condition
        .map(splitSubqueries(_, corrScalars))
        .getOrElse((None, Seq.empty, Seq.empty))
      GvtUpdateCommand(root,
        residual.getOrElse(org.apache.spark.sql.functions.lit(true)),
        plainAssigns.toMap,
        subs.collect { case i: InCond => i },
        subs.collect { case e: ExistsCond => e },
        scalarConds = scalars,
        scalarAssigns = scalarAssigns.toMap,
        corrScalars = corrScalars.toSeq)

    case m: MergeIntoTable if m.resolved =>
      m.targetTable match {
        case GvtTarget(root, pinned) =>
          requireLive(pinned, "MERGE INTO")
          rewriteMerge(m, root)
        case _ => plan
      }

    case _ => plan
  }

  private def rewriteMerge(m: MergeIntoTable, root: String): LogicalPlan = {
    val tgtAttrs = m.targetTable.outputSet
    val srcAttrs = m.sourceTable.outputSet
    val tgtCols = m.targetTable.output.map(_.name)
    val srcCols = m.sourceTable.output.map(_.name)
    // MERGE WITH SCHEMA EVOLUTION (Delta parity): source columns absent
    // from the target join its schema — star actions below include
    // them, and the command's mergeInto widens the target with typed
    // NULLs before the clause join
    val evolve = m.withSchemaEvolution
    // ON clause → key pairs (targetName, sourceName)
    val pairs = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tgtAttrs.contains(a) && srcAttrs.contains(b) => (a.name, b.name)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tgtAttrs.contains(b) && srcAttrs.contains(a) => (b.name, a.name)
      case other =>
        unsupported(s"a MERGE ON clause beyond target-col = source-col " +
          s"equality conjunctions ($other)")
    }
    val keyOfSrc = pairs.map(_.swap).toMap
    val keys = pairs.map(_._1)
    // value expressions qualify into mergeClauses' packed-struct space:
    // target attr → t.<c>, source non-key attr → s.<c'>, key attrs →
    // the top-level (coalesced) key column
    def qualify(e: Expression): Column = {
      if (e.exists(_.isInstanceOf[SubqueryExpression]))
        unsupported("a subquery in a MERGE clause")
      NativeColumns.ofExpr(e.transform {
        case a: AttributeReference if tgtAttrs.contains(a) =>
          if (keys.contains(a.name)) UnresolvedAttribute(Seq(a.name))
          else UnresolvedAttribute(Seq("t", a.name))
        case a: AttributeReference if srcAttrs.contains(a) =>
          keyOfSrc.get(a.name) match {
            case Some(k) => UnresolvedAttribute(Seq(k))
            case None => UnresolvedAttribute(Seq("s", a.name))
          }
      })
    }
    // SQL MERGE evaluates matched clauses FIRST-WINS per row; the
    // one-join clause merge expresses "delete where D, else update".
    // Faithful mappings: leading (possibly several) conditional DELETEs
    // OR into one condition; an UNCONDITIONAL clause consumes every
    // remaining matched row, so later matched clauses are DEAD and
    // ignored (exactly SQL's semantics, never silently reordered).
    import org.apache.spark.sql.functions.{col => fcol, lit => flit, when => fwhen}
    var matchedDelete: Option[Column] = None
    var matchedUpdate = Map.empty[String, Column]
    var matchedConsumed = false
    var matchedTerminal = false
    def orElseDelete(c: Column): Unit =
      matchedDelete = Some(matchedDelete.map(_ || c).getOrElse(c))
    def updateAssigns(assigns: Seq[Assignment],
                      cond: Option[Expression]): Map[String, Column] =
      assigns.map { a =>
        a.key match {
          case k: AttributeReference =>
            val v = qualify(a.value)
            // conditional UPDATE: rows failing the condition keep the
            // target value (valid only as the LAST matched clause —
            // fall-through to a later clause is not expressible)
            k.name -> cond.map(c =>
              fwhen(qualify(c), v).otherwise(fcol(s"t.${k.name}"))).getOrElse(v)
          case other => unsupported(s"UPDATE SET on a nested field ($other)")
        }
      }.toMap
    m.matchedActions.foreach {
      case _ if matchedConsumed => () // dead clause: first-wins
      case a if matchedTerminal =>
        unsupported(s"a matched clause after a conditional UPDATE ($a) — " +
          "per-row fall-through is not expressible in the one-join merge")
      case DeleteAction(cond) =>
        orElseDelete(cond.map(qualify).getOrElse(flit(true)))
        if (cond.isEmpty) matchedConsumed = true
      case UpdateAction(cond, assigns, _) =>
        matchedUpdate = updateAssigns(assigns, cond)
        if (cond.isEmpty) matchedConsumed = true else matchedTerminal = true
      case UpdateStarAction(cond) =>
        val carried = srcCols.map(c => keyOfSrc.getOrElse(c, c))
        val base = (if (evolve) carried else tgtCols.filter(carried.contains))
          .filterNot(keys.contains)
        matchedUpdate = base.map(c => c -> cond.map(cc =>
          fwhen(qualify(cc), fcol(s"s.$c")).otherwise(fcol(s"t.$c")))
          .getOrElse(fcol(s"s.$c"))).toMap
        if (cond.isEmpty) matchedConsumed = true else matchedTerminal = true
      case other => unsupported(s"MERGE matched action $other")
    }
    // NOT MATCHED BY SOURCE clauses (Delta 2.3+): act on target rows
    // without a source match — same first-wins mapping
    var nmsDelete: Option[Column] = None
    var nmsUpdate = Map.empty[String, Column]
    var nmsConsumed = false
    var nmsTerminal = false
    m.notMatchedBySourceActions.foreach {
      case _ if nmsConsumed => ()
      case a if nmsTerminal =>
        unsupported(s"a NOT MATCHED BY SOURCE clause after a conditional " +
          s"UPDATE ($a)")
      case DeleteAction(cond) =>
        val c = cond.map(qualify).getOrElse(flit(true))
        nmsDelete = Some(nmsDelete.map(_ || c).getOrElse(c))
        if (cond.isEmpty) nmsConsumed = true
      case UpdateAction(cond, assigns, _) =>
        nmsUpdate = updateAssigns(assigns, cond)
        if (cond.isEmpty) nmsConsumed = true else nmsTerminal = true
      case other => unsupported(s"MERGE not-matched-by-source action $other")
    }
    // NOT MATCHED clauses (Delta parity: multiple, each optionally
    // conditioned — `WHEN NOT MATCHED AND c THEN INSERT …` chains).
    // First-wins per source row, expressed as nested whens in the
    // one-join merge; a row matching no clause is not inserted. An
    // explicit column list is general (unlisted columns insert NULL) —
    // EXCEPT the merge keys: the one-join merge emits the coalesced
    // join key, so a key column must be assigned exactly its source
    // join counterpart (anything else is inexpressible — refuse loudly,
    // never silently substitute the join key).
    def keyAssignOk(k: String, v: Expression): Boolean = v match {
      case a: AttributeReference if srcAttrs.contains(a) =>
        keyOfSrc.getOrElse(a.name, a.name) == k
      case _ => false
    }
    var insertClauses = Vector.empty[graft.ops.RelationalOps.MergeInsert]
    var insertConsumed = false
    m.notMatchedActions.foreach {
      case _ if insertConsumed => () // dead clause after an unconditional
                                     // one: SQL first-wins
      case InsertStarAction(cond) =>
        insertClauses :+= graft.ops.RelationalOps.MergeInsert(
          cond.map(qualify), None)
        if (cond.isEmpty) insertConsumed = true
      case InsertAction(cond, assigns) =>
        val vals = assigns.map { a =>
          a.key match {
            case k: AttributeReference if keys.contains(k.name) =>
              if (!keyAssignOk(k.name, a.value))
                unsupported(s"a MERGE INSERT assigning merge key ${k.name} " +
                  "anything other than its source join counterpart (the " +
                  "one-join merge inserts the join key itself)")
              k.name -> qualify(a.value)
            case k: AttributeReference => k.name -> qualify(a.value)
            case other => unsupported(s"MERGE INSERT on a nested field ($other)")
          }
        }.toMap
        // every merge key must be assigned (an unlisted key would insert
        // NULL in SQL, which the join-key output cannot express)
        val missing = keys.filterNot(vals.contains)
        if (missing.nonEmpty)
          unsupported(s"a MERGE INSERT column list omitting merge key(s) " +
            s"${missing.mkString(", ")} (SQL would insert NULL there; the " +
            "one-join merge inserts the join key — include the key columns)")
        insertClauses :+= graft.ops.RelationalOps.MergeInsert(
          cond.map(qualify), Some(vals))
        if (cond.isEmpty) insertConsumed = true
      case other => unsupported(s"MERGE not-matched action $other")
    }
    val insertNotMatched = insertClauses.nonEmpty
    // rename source columns to the target's key names so the USING-
    // style key join in mergeClauses lines up; a source already
    // carrying a column under the target key's name would collide
    pairs.foreach { case (t, s) =>
      if (t != s && srcCols.contains(t))
        unsupported(s"a MERGE source carrying BOTH the join column $s " +
          s"and an unrelated column named $t (renaming $s -> $t would collide)")
    }
    GvtMergeCommand(root, m.sourceTable, pairs, keys,
      matchedDelete, matchedUpdate, insertNotMatched, nmsDelete, nmsUpdate,
      allowEvolution = evolve,
      // a single unconditional INSERT * is the plain boolean path (the
      // dominant shape — keeps the established plan); anything richer
      // rides the clause list
      insertClauses = insertClauses match {
        case Vector(graft.ops.RelationalOps.MergeInsert(None, None)) => Seq.empty
        case cs => cs
      })
  }
}

/** Shared run-time resolution of a DML command's subquery conjuncts:
  * uncorrelated EXISTS checks fold to a constant (a FALSE one makes the
  * whole condition false — the command no-ops, nothing committed); IN
  * conjuncts (and equality-decorrelated EXISTS) become distributed
  * [[VersionedTable.LocateSemiJoin]]s on the locate scan; uncorrelated
  * SCALAR subqueries evaluate to at-most-one-row literals. Subquery
  * plans execute HERE, at command time, under the session that runs the
  * DML — never during resolution. */
private[plans] object SubqueryConds {
  def resolve(spark: SparkSession, inConds: Seq[GvtDml.InCond],
              existsConds: Seq[GvtDml.ExistsCond])
      : Option[Seq[VersionedTable.LocateSemiJoin]] = {
    val allTrue = existsConds.forall { ec =>
      val nonEmpty = !NativeColumns.ofPlan(spark, ec.plan).isEmpty
      nonEmpty != ec.negated
    }
    if (!allTrue) None
    else Some(inConds.map(ic => VersionedTable.LocateSemiJoin(
      ic.values, NativeColumns.ofPlan(spark, ic.plan), ic.negated,
      notIn3VL = ic.notIn3VL, corrKeys = ic.corrKeys,
      residuals = ic.residuals)))
  }

  /** Materialize each decorrelated scalar-aggregate plan into the
    * LEFT-join refinements the locate scan applies before evaluating
    * the condition/assignments. */
  def scalarJoins(spark: SparkSession, corrScalars: Seq[GvtDml.CorrScalar])
      : Seq[VersionedTable.LocateScalarJoin] =
    corrScalars.map(cs => VersionedTable.LocateScalarJoin(
      cs.keys, NativeColumns.ofPlan(spark, cs.plan), cs.out))

  /** Evaluate every uncorrelated ScalarSubquery in `e` (one ≤1-row job
    * each — SQL semantics: zero rows read NULL, two throw) and fold the
    * results as typed literals; the folded expression then resolves
    * like any other DML condition/assignment. */
  def evalScalars(spark: SparkSession, e: Expression): Column = {
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val folded = e.transform {
      case s: ScalarSubquery =>
        val rows = NativeColumns.ofPlan(spark, s.plan).limit(2).collect()
        if (rows.length > 1) throw new IllegalStateException(
          "gvt SQL DML: a scalar subquery returned more than one row")
        val v = if (rows.isEmpty || rows(0).isNullAt(0)) null else rows(0).get(0)
        Literal.create(v, s.dataType)
    }
    GvtDml.exprToColumn(folded)
  }
}

/** `DELETE FROM <gvt> WHERE p` → an O(changed) deletion-vector commit.
  * Uncorrelated `IN (SELECT …)` conjuncts ride as locate joins — the
  * reference's orphan-reconciliation (utils/quality.py:110-116) becomes
  * `DELETE FROM t WHERE fk NOT IN (SELECT pk FROM parent)` at scale. */
case class GvtDeleteCommand(root: String, cond: Column,
                            inConds: Seq[GvtDml.InCond] = Seq.empty,
                            existsConds: Seq[GvtDml.ExistsCond] = Seq.empty,
                            scalarConds: Seq[
                              org.apache.spark.sql.catalyst.expressions.Expression] =
                              Seq.empty,
                            corrScalars: Seq[GvtDml.CorrScalar] = Seq.empty)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] =
    inConds.map(_.plan) ++ existsConds.map(_.plan) ++ corrScalars.map(_.plan)
  override def run(spark: SparkSession): Seq[Row] = {
    val full = scalarConds.map(SubqueryConds.evalScalars(spark, _))
      .foldLeft(cond)(_ && _)
    SubqueryConds.resolve(spark, inConds, existsConds).foreach { joins =>
      VersionedTable.deleteWhereVector(spark, root, full, joins,
        SubqueryConds.scalarJoins(spark, corrScalars))
    }
    Seq.empty
  }
}

/** `UPDATE <gvt> SET … WHERE p` → an O(changed) DV UPDATE commit. */
case class GvtUpdateCommand(root: String, cond: Column,
                            assignments: Map[String, Column],
                            inConds: Seq[GvtDml.InCond] = Seq.empty,
                            existsConds: Seq[GvtDml.ExistsCond] = Seq.empty,
                            scalarConds: Seq[
                              org.apache.spark.sql.catalyst.expressions.Expression] =
                              Seq.empty,
                            scalarAssigns: Map[String,
                              org.apache.spark.sql.catalyst.expressions.Expression] =
                              Map.empty,
                            corrScalars: Seq[GvtDml.CorrScalar] = Seq.empty)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] =
    inConds.map(_.plan) ++ existsConds.map(_.plan) ++ corrScalars.map(_.plan)
  override def run(spark: SparkSession): Seq[Row] = {
    val full = scalarConds.map(SubqueryConds.evalScalars(spark, _))
      .foldLeft(cond)(_ && _)
    val allAssigns = assignments ++ scalarAssigns.map { case (k, e) =>
      k -> SubqueryConds.evalScalars(spark, e) }
    SubqueryConds.resolve(spark, inConds, existsConds).foreach { joins =>
      VersionedTable.updateWhereVector(spark, root, full, allAssigns, joins,
        SubqueryConds.scalarJoins(spark, corrScalars))
    }
    Seq.empty
  }
}

/** `MERGE INTO <gvt> USING s ON …` → [[VersionedTable.mergeInto]]'s
  * one-join clause merge with conditional-commit retry. The source
  * plan executes lazily inside the merge's join. */
case class GvtMergeCommand(root: String, source: LogicalPlan,
                           keyPairs: Seq[(String, String)], keys: Seq[String],
                           matchedDelete: Option[Column],
                           matchedUpdate: Map[String, Column],
                           insertNotMatched: Boolean,
                           nmsDelete: Option[Column] = None,
                           nmsUpdate: Map[String, Column] = Map.empty,
                           allowEvolution: Boolean = false,
                           insertClauses: Seq[graft.ops.RelationalOps.MergeInsert] =
                             Seq.empty)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val srcDf = keyPairs.foldLeft(NativeColumns.ofPlan(spark, source)) {
      case (d, (t, s)) => if (t == s) d else d.withColumnRenamed(s, t)
    }
    VersionedTable.mergeInto(spark, root, srcDf, keys,
      matchedDelete, matchedUpdate, insertNotMatched,
      nmsDelete = nmsDelete, nmsUpdate = nmsUpdate,
      allowEvolution = allowEvolution, insertClauses = insertClauses)
    Seq.empty
  }
}

/** `MERGE WITH SCHEMA EVOLUTION INTO <gvt>` — parse-time target
  * widening. Spark's analyzer expands `UPDATE SET *` / `INSERT *`
  * against the TARGET's schema before any injected resolution rule can
  * run (and rejects explicit assignments to columns the target lacks),
  * so by analysis time the evolution must already be visible: this
  * post-parse pass projects a typed NULL for every source column the
  * gvt target lacks onto the target plan. Star expansion then includes
  * the new columns naturally, explicit `SET new = s.new` assignments
  * resolve, [[GvtDml]] routes the merge with allowEvolution=true, and
  * the commit carries the evolved schema through the write-side
  * evolution gate. Non-gvt targets pass through untouched (Spark's own
  * v2 handling and errors apply).
  *
  * Documented divergence from Delta: WITH SCHEMA EVOLUTION joins ALL
  * new source columns (existing rows read NULL), whether or not a
  * clause references them — Delta joins only star-carried/referenced
  * ones. The explicit keyword makes the wider behavior safe. */
object GvtMergeEvolution {
  import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedStar}
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.types.StructType
  import scala.util.control.NonFatal

  def resolve(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case m: MergeIntoTable if m.withSchemaEvolution =>
        (for {
          tgtSchema <- gvtSchema(spark, m.targetTable)
          srcSchema <- analyzedSchema(spark, m.sourceTable)
          newCols = srcSchema.filterNot(f =>
            tgtSchema.fieldNames.contains(f.name))
          if newCols.nonEmpty
        } yield m.copy(targetTable = widen(m.targetTable, newCols.toSeq)))
          .getOrElse(m)
    }

  private def analyzedSchema(spark: SparkSession,
                             plan: LogicalPlan): Option[StructType] =
    try Some(spark.sessionState.analyzer.execute(plan).schema)
    catch { case NonFatal(_) => None } // let normal analysis report it

  /** The LIVE schema of the merge target iff it is a gvt relation —
    * `` gvt.`path` `` directly, or a registered view resolved through
    * the catalog (the [[GvtTimeTravel.rootOf]] precedent). */
  private def gvtSchema(spark: SparkSession,
                        plan: LogicalPlan): Option[StructType] = plan match {
    case SubqueryAlias(_, child) => gvtSchema(spark, child)
    case u: UnresolvedRelation => u.multipartIdentifier match {
      case Seq("gvt", path) =>
        try Some(VersionedTable.readLatest(spark, path).schema)
        catch { case NonFatal(_) => None }
      case parts => // temp view or catalog table, any part count
        try {
          val t = spark.table(parts.mkString("."))
          GvtDml.gvtRootOf(t.queryExecution.analyzed).map(_ => t.schema)
        } catch { case NonFatal(_) => None }
    }
    case _ => None
  }

  private def widen(plan: LogicalPlan,
                    newCols: Seq[org.apache.spark.sql.types.StructField])
      : LogicalPlan = plan match {
    case SubqueryAlias(id, child) => SubqueryAlias(id, widen(child, newCols))
    case u: UnresolvedRelation =>
      Project(UnresolvedStar(None) +: newCols.map(f =>
        Alias(Literal.create(null, f.dataType), f.name)()), u)
    case other => other
  }
}

/** In-query time travel over gvt relations — Delta's
  * `SELECT … FROM t VERSION AS OF n` / `TIMESTAMP AS OF ts` syntax
  * (the options-only surface `OPTIONS (versionAsOf …)` remains).
  * Spark parses the suffix into [[RelationTimeTravel]], which only v2
  * catalogs resolve — its analyzer REJECTS time travel over temp views
  * before any injected resolution rule can run, so the rewrite happens
  * at PARSE time instead: [[GvtSqlParser]] post-processes every parsed
  * plan, substituting a version-pinned gvt relation for each
  * `RelationTimeTravel` whose target is a registered gvt view (or the
  * `` gvt.`path` `` form). Non-gvt targets pass through untouched for
  * Spark's own resolution (and its own error messages). */
object GvtTimeTravel {
  import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
  import org.apache.spark.sql.types.{StringType, TimestampType}

  private def tsParam(e: Expression): Option[(String, String)] = e match {
    case Literal(s, StringType) => Some("timestampAsOf" -> s.toString)
    case Literal(micros: Long, TimestampType) =>
      Some("timestampAsOf" -> (micros / 1000L).toString)
    case other if other.foldable =>
      Option(other.eval(null)).flatMap(v => tsParam(Literal(v, other.dataType)))
    case _ => None
  }

  /** The gvt root a time-travel target names: `` gvt.`path` `` directly,
    * a single-part name via its registered view's analyzed plan. */
  private def rootOf(spark: SparkSession,
                     parts: Seq[String]): Option[String] = parts match {
    case Seq("gvt", path) => Some(path)
    case Seq(name) =>
      (try Some(spark.table(name).queryExecution.analyzed)
       catch { case scala.util.control.NonFatal(_) => None })
        .flatMap(GvtDml.gvtRootOf).map(_._1)
    case _ => None
  }

  def resolve(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
        rootOf(spark, u.multipartIdentifier) match {
          case Some(root) =>
            val params = Map("path" -> root) ++
              version.map("versionAsOf" -> _) ++ ts.flatMap(tsParam)
            val rel = new graft.sources.gvt.DefaultSource()
              .createRelation(spark.sqlContext, params)
            SubqueryAlias(u.multipartIdentifier.last,
              spark.baseRelationToDataFrame(rel).queryExecution.logical)
          case None => tt
        }
    }
}
