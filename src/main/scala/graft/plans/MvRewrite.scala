package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, Expression, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sources.MaterializedView
import graft.sources.MaterializedView.MvSpec
import graft.sources.gvt.{GvtDvRelation, GvtFileIndex}

/** Automatic query rewrite over registered materialized views
  * ([[graft.sources.MaterializedView]]) — the classic warehouse
  * optimization (Oracle/Calcite "materialized view rewrite"; Databricks
  * MVs do the same for Delta): an `Aggregate` over a gvt base table
  * rewrites to a (usually orders-of-magnitude smaller) re-aggregation
  * of the MV table when
  *
  *  - the query's grouping keys are a SUBSET of the MV's grouping
  *    columns (bare attributes; rollup re-aggregates: sum of sums,
  *    sum of counts, min of mins, max of maxes),
  *  - every aggregate is answerable from the MV's algebra — `sum`,
  *    `count(*)` / `count(non-null col)` (the MV's internal `_rows`),
  *    `count(nullable col)` (a declared count or a sum's internal
  *    non-null counter), `min`/`max` (declared), and `avg` (total sum
  *    over total non-null count, exactly Spark's own sum/count
  *    semantics) — no DISTINCT, no FILTER clauses; covered aggregates
  *    may sit INSIDE deterministic output scaffolding (`sum(a) /
  *    count(*)`, `coalesce(sum(x), 0)`, casts, arithmetic over several
  *    aggregates — the common BI shapes),
  *  - any `Filter` between aggregate and relation references ONLY MV
  *    grouping columns (group rows partition the space, so the
  *    predicate evaluates exactly on the MV), and
  *  - the MV is FRESH: its recorded base version equals the version
  *    the query's relation actually serves (vector-free chain or
  *    pending-DV relation alike). A stale MV degrades to the base
  *    scan — never to a stale answer. Version pinning makes the check
  *    exact: the relation carries the version it resolved, so a
  *    concurrent commit cannot slip between check and scan.
  *
  * At 100 TB this turns the reference's repeated gold-mart dashboard
  * aggregations into MV-sized scans — the base is read once per
  * refresh delta, not once per query. Escape hatch:
  * `spark.graft.mvRewrite.enabled=false`.
  */
object MvRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean = SQLConf.get
    .getConfString("spark.graft.mvRewrite.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || MaterializedView.isBuilding) return plan
    // storage-backed registry: first planner contact with a gvt root
    // probes its persisted registrations (one listing per root per
    // driver), so views created by an EARLIER session rewrite here
    // with no re-registration call
    plan.foreach {
      case lr: LogicalRelation => servedVersion(lr).foreach { case (root, _) =>
        MaterializedView.discover(SparkSession.active, root)
      }
      case _ => ()
    }
    val p1 = applyExact(plan)
    p1.transform {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        unwrap(child).flatMap { case (lr, cond) =>
          servedVersion(lr).flatMap { case (root, version) =>
            MaterializedView.viewsOf(root).view
              .filter(_.baseVersion == version)
              .flatMap(spec => rewrite(agg, groupExprs, aggExprs, cond, spec))
              .headOption
          }
        }.orElse(rollupOverJoinView(agg, groupExprs, aggExprs, child))
          .getOrElse(agg)
    }
  }

  /** Algebraic ROLLUP over a differential join view: a query aggregate
    * whose child `sameResult`s a registered join view's own join
    * subtree, with grouping keys a SUBSET of the view's groups and
    * every aggregate semantically equal to one of the view's (or an
    * `avg`/`count` its counters answer), re-aggregates the MV — the
    * exact tier serves only the identical shape; this serves the BI
    * rollups above it (`GROUP BY segment` over a (segment, status)
    * join view) without touching the join. Freshness is structural:
    * the cached join subtree embeds every relation's chain dirs, so a
    * query over an advanced base stops matching. Aggregate matching is
    * SEMANTIC (attributes aligned positionally across the sameResult
    * pair, then `semanticEquals`), so aliases and exprIds don't
    * matter. */
  private def rollupOverJoinView(agg: Aggregate, groupExprs: Seq[Expression],
                                 aggExprs: Seq[NamedExpression],
                                 child: LogicalPlan): Option[LogicalPlan] = {
    val entries = MaterializedView.exactViews.filter(_.joinAgg.isDefined)
    if (entries.isEmpty) return None
    entries.view.flatMap { e =>
      try {
      val info = e.joinAgg.get
      matchSubtree(child, info.joinChild) match {
      case None => None
      case Some((attrMap, extras)) =>
        def aligned(ex: Expression): Expression = ex.transform {
          case a: AttributeReference =>
            attrMap.getOrElse(a.exprId.id, a)
        }
        // defining group expressions, positionally named
        val defGroups: Seq[(Expression, String)] = info.ge.zip(info.groups)
        // defining aggregates by output name (ae order = aggs order)
        val defAggs: Seq[(AggregateExpression, String)] = {
          val it = info.aggs.iterator
          info.ae.collect {
            case Alias(ag: AggregateExpression, _) if it.hasNext =>
              (ag, it.next().out)
          }
        }
        val spark = SparkSession.active

        def groupColOf(ex: Expression): Option[String] = {
          val al = aligned(ex)
          defGroups.collectFirst { case (g, n) if g.semanticEquals(al) => n }
        }

        // rollups carrying DISTINCT counts serve from the join view's
        // multiplicity SIDE table alone (distinct values re-aggregate
        // at any grouping subset where distinct counts cannot); mixed
        // distinct+plain rollups fail closed to the join
        val hasDistinctQ = aggExprs.exists(_.exists {
          case ae: AggregateExpression => ae.isDistinct
          case _ => false
        })
        if (hasDistinctQ)
          rollupFromSide(e, info, defAggs, groupExprs, aggExprs, extras,
            aligned _, groupColOf _)
        else {
        val mvPlan = MaterializedView
          .readMv(spark, e.spec.mvRoot, e.mvVersion).queryExecution.analyzed
        val mvAttr: Map[String, Attribute] =
          mvPlan.output.map(a => a.name -> a).toMap
        def mv(name: String): Attribute =
          mvAttr.getOrElse(name, throw MvRewrite.MissingMvColumn)
        def sumOf(a: Attribute): Expression = Sum(a).toAggregateExpression()
        /** Map one query aggregate onto the MV's re-aggregation. */
        def mapAgg(ae: AggregateExpression): Option[Expression] = {
          if (ae.filter.nonEmpty || ae.isDistinct) return None
          val al = aligned(ae).asInstanceOf[AggregateExpression]
          // exact semantic match against a declared aggregate
          defAggs.collectFirst {
            case (d, out) if d.semanticEquals(al) => (d, out)
          } match {
            case Some((d, out)) => d.aggregateFunction match {
              case _: Sum => Some(sumOf(mv(out)))
              case _: Count =>
                Some(Coalesce(Seq(sumOf(mv(out)), Literal(0L))))
              case _: Min => Some(Min(mv(out)).toAggregateExpression())
              case _: Max => Some(Max(mv(out)).toAggregateExpression())
              case _ => None
            }
            case None => al.aggregateFunction match {
              // count(*) answers from the always-materialized _rows
              case Count(Seq(l: Literal)) if l.value != null =>
                Some(Coalesce(Seq(sumOf(mv("_rows")), Literal(0L))))
              // avg(x) = total sum / total non-null count when the view
              // declares sum(x) (its _nn_ counter rides along)
              case Average(in, _) if al.dataType == DoubleType =>
                defAggs.collectFirst {
                  case (d, out) if d.aggregateFunction.isInstanceOf[Sum] &&
                      d.aggregateFunction.asInstanceOf[Sum].child
                        .semanticEquals(in) =>
                    Divide(Cast(sumOf(mv(out)), DoubleType),
                      Cast(sumOf(mv(s"_nn_$out")), DoubleType))
                }
              // count(x) answers from sum(x)'s non-null counter
              case Count(Seq(in)) =>
                defAggs.collectFirst {
                  case (d, out) if d.aggregateFunction.isInstanceOf[Sum] &&
                      d.aggregateFunction.asInstanceOf[Sum].child
                        .semanticEquals(in) =>
                    Coalesce(Seq(sumOf(mv(s"_nn_$out")), Literal(0L)))
                }
              case _ => None
            }
          }
        }

        try {
          // NOTE: control flow inside this block is via the
          // MissingMvColumn throw, NEVER a non-local `return` — a
          // return from inside the enclosing flatMap closure would
          // escape the per-entry NonFatal catch and abort the whole
          // candidate scan, skipping other registered views that could
          // serve the rollup
          val groupNames: Seq[String] = groupExprs.map(g =>
            groupColOf(g).getOrElse(throw MvRewrite.MissingMvColumn))
          def remap(ex: Expression): Expression = ex match {
            case ag: AggregateExpression =>
              val m = mapAgg(ag).getOrElse(throw MvRewrite.MissingMvColumn)
              if (m.dataType != ag.dataType) throw MvRewrite.MissingMvColumn
              m
            case a: AttributeReference =>
              mv(groupColOf(a).getOrElse(throw MvRewrite.MissingMvColumn))
            case _: SubqueryExpression => throw MvRewrite.MissingMvColumn
            case other if !other.deterministic =>
              throw MvRewrite.MissingMvColumn
            case other => other.withNewChildren(other.children.map(remap))
          }
          val rebuilt: Seq[NamedExpression] = aggExprs.map {
            case a: AttributeReference =>
              Alias(mv(groupColOf(a)
                .getOrElse(throw MvRewrite.MissingMvColumn)), a.name)(
                exprId = a.exprId)
            case al @ Alias(c, name) =>
              val mapped = remap(c)
              if (mapped.dataType != c.dataType)
                throw MvRewrite.MissingMvColumn
              Alias(mapped, name)(exprId = al.exprId)
            case _ => throw MvRewrite.MissingMvColumn
          }
          // COMPENSATION predicates: the query's extra filter conjuncts
          // (beyond the defining plan's own) apply on the MV when every
          // one references ONLY grouping columns — group rows partition
          // the space, so filtering MV rows equals filtering base rows
          val comp: Seq[Expression] = extras.map { c =>
            if (!c.deterministic ||
                c.exists(_.isInstanceOf[SubqueryExpression]))
              throw MvRewrite.MissingMvColumn
            c.transform {
              case a: AttributeReference =>
                mv(groupColOf(a).getOrElse(throw MvRewrite.MissingMvColumn))
            }
          }
          val mvChild: LogicalPlan = comp
            .reduceOption(org.apache.spark.sql.catalyst.expressions.And(_, _))
            .map(Filter(_, mvPlan)).getOrElse(mvPlan)
          Some(Aggregate(groupNames.map(mv), rebuilt, mvChild))
        } catch { case MvRewrite.MissingMvColumn => None }
        }
      }
      } catch {
        // an optional rewrite must NEVER fail the user's query: any
        // comparison surprise on an exotic plan degrades to no-match
        case scala.util.control.NonFatal(_) => None
      }
    }.headOption
  }

  /** Serve a DISTINCT-counting rollup over a matched join view from
    * its multiplicity side table: every aggregate must be
    * count(distinct v) (or count(v)) where v aligns to ONE declared
    * count_distinct value of the view; grouping keys are the usual
    * group-column subset, and extra query conjuncts compensate on the
    * side rows (same partitioning argument — side rows carry the full
    * group key). count(v) rides the summed multiplicities. */
  private def rollupFromSide(e: MaterializedView.ExactEntry,
                             info: MaterializedView.JoinAggInfo,
                             defAggs: Seq[(AggregateExpression, String)],
                             groupExprs: Seq[Expression],
                             aggExprs: Seq[NamedExpression],
                             extras: Seq[Expression],
                             aligned: Expression => Expression,
                             groupColOf: Expression => Option[String])
      : Option[LogicalPlan] = {
    // the view's count_distinct slots: out name → defining value attr
    val cdDefs: Seq[(String, Expression)] = defAggs.collect {
      case (d, out) if d.isDistinct => d.aggregateFunction match {
        case Count(Seq(v)) => (out, v)
        case _ => return None
      }
    }
    if (cdDefs.isEmpty) return None
    // every query aggregate must be count([distinct] x) with aligned x
    // matching ONE cd slot's value (a single side table serves all)
    var slot: Option[(String, Expression)] = None
    def slotFor(in: Expression): Option[(String, Expression)] = {
      val al = aligned(in)
      val hit = cdDefs.find(_._2.semanticEquals(al))
      (slot, hit) match {
        case (None, Some(h)) => slot = Some(h); slot
        case (Some(s), Some(h)) if s._1 == h._1 => slot
        case _ => None
      }
    }
    try {
      val spark = SparkSession.active
      // pre-validate all aggregates and pin the slot
      aggExprs.foreach(_.foreach {
        case ae: AggregateExpression =>
          if (ae.filter.nonEmpty) throw MvRewrite.MissingMvColumn
          ae.aggregateFunction match {
            case Count(Seq(in)) if slotFor(in).isDefined => ()
            case _ => throw MvRewrite.MissingMvColumn
          }
        case _ => ()
      })
      val (out, vDef) = slot.getOrElse(throw MvRewrite.MissingMvColumn)
      val vName = vDef match {
        case a: AttributeReference => a.name
        case _ => throw MvRewrite.MissingMvColumn
      }
      val sidePlan = MaterializedView.readMv(spark,
        MaterializedView.sideRootOf(e.spec.mvRoot, out),
        e.sideVersions.getOrElse(out, -1L)).queryExecution.analyzed
      val sideAttr: Map[String, Attribute] =
        sidePlan.output.map(a => a.name -> a).toMap
      def side(name: String): Attribute =
        sideAttr.getOrElse(name, throw MvRewrite.MissingMvColumn)

      def remap(ex: Expression): Expression = ex match {
        case ae: AggregateExpression if ae.isDistinct =>
          Count(Seq(side(vName): Expression))
            .toAggregateExpression(isDistinct = true)
        case ae: AggregateExpression =>
          Coalesce(Seq(
            Sum(side("_mult")).toAggregateExpression(), Literal(0L)))
        case a: AttributeReference =>
          side(groupColOf(a).getOrElse(throw MvRewrite.MissingMvColumn))
        case _: SubqueryExpression => throw MvRewrite.MissingMvColumn
        case other if !other.deterministic =>
          throw MvRewrite.MissingMvColumn
        case other => other.withNewChildren(other.children.map(remap))
      }
      val groupNames: Seq[String] = groupExprs.map(g =>
        groupColOf(g).getOrElse(throw MvRewrite.MissingMvColumn))
      val rebuilt: Seq[NamedExpression] = aggExprs.map {
        case a: AttributeReference =>
          Alias(side(groupColOf(a)
            .getOrElse(throw MvRewrite.MissingMvColumn)), a.name)(
            exprId = a.exprId)
        case al @ Alias(c, name) =>
          val mapped = remap(c)
          if (mapped.dataType != c.dataType) throw MvRewrite.MissingMvColumn
          Alias(mapped, name)(exprId = al.exprId)
        case _ => throw MvRewrite.MissingMvColumn
      }
      val comp: Seq[Expression] = extras.map { c =>
        if (!c.deterministic || c.exists(_.isInstanceOf[SubqueryExpression]))
          throw MvRewrite.MissingMvColumn
        c.transform {
          case a: AttributeReference =>
            side(groupColOf(a).getOrElse(throw MvRewrite.MissingMvColumn))
        }
      }
      val sideChild: LogicalPlan = comp
        .reduceOption(org.apache.spark.sql.catalyst.expressions.And(_, _))
        .map(Filter(_, sidePlan)).getOrElse(sidePlan)
      Some(Aggregate(groupNames.map(side), rebuilt, sideChild))
    } catch { case MvRewrite.MissingMvColumn => None }
  }

  /** Lockstep structural matcher for the join-rollup tier: does the
    * query aggregate's child compute the SAME join the view does —
    * modulo column pruning (attribute-only Projects skipped on either
    * side) and EXTRA query-side filter conjuncts (returned for
    * compensation)? On success returns the query→defining attribute
    * alignment (built from the pairwise `sameResult` leaf relations,
    * extended through matched compute-Projects) and the extra
    * conjuncts. Fail-closed on any shape surprise: a defining-side
    * conjunct the query lacks (the MV would be missing rows), a
    * mismatched join type/condition, or any node class outside
    * project/filter/join/alias. */
  private def matchSubtree(q: LogicalPlan, d: LogicalPlan)
      : Option[(Map[Long, Attribute], Seq[Expression])] = {
    import org.apache.spark.sql.catalyst.expressions.And
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val qLeaves = q.collectLeaves()
    val dLeaves = d.collectLeaves()
    if (qLeaves.length != dLeaves.length) return None
    val leavesOk = qLeaves.zip(dLeaves).forall {
      case (a: LogicalRelation, b: LogicalRelation) =>
        a.output.length == b.output.length && a.sameResult(b)
      case _ => false
    }
    if (!leavesOk) return None
    var amap: Map[Long, Attribute] = qLeaves.zip(dLeaves).flatMap {
      case (a, b) => a.output.map(_.exprId.id).zip(b.output)
    }.toMap
    def aligned(e: Expression): Expression = e.transform {
      case a: AttributeReference => amap.getOrElse(a.exprId.id, a)
    }
    def conj(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conj(l) ++ conj(r)
      case x => Seq(x)
    }
    val extras = Seq.newBuilder[Expression]
    def walk(qp: LogicalPlan, dp: LogicalPlan): Boolean = (qp, dp) match {
      case (SubqueryAlias(_, qc), _) => walk(qc, dp)
      case (_, SubqueryAlias(_, dc)) => walk(qp, dc)
      case (Project(pl, qc), _)
          if pl.forall(_.isInstanceOf[AttributeReference]) => walk(qc, dp)
      case (_, Project(pl, dc))
          if pl.forall(_.isInstanceOf[AttributeReference]) => walk(qp, dc)
      case (Filter(cq, qc), Filter(cd, dc)) =>
        // the defining conjuncts must all be covered by the query's
        // (else the MV holds rows the query excludes... or misses
        // rows — either way unservable); query-side surplus becomes
        // compensation
        val dConj = conj(cd)
        val qConj = conj(cq).map(c => (c, aligned(c)))
        if (!dConj.forall(dc0 => qConj.exists(_._2.semanticEquals(dc0))))
          return false
        extras ++= qConj.collect {
          case (c, al) if !dConj.exists(al.semanticEquals) => c
        }
        walk(qc, dc)
      case (Filter(cq, qc), _) =>
        extras ++= conj(cq); walk(qc, dp)
      case (_, _: Filter) => false
      case (jq: Join, jd: Join) =>
        jq.joinType == jd.joinType &&
          ((jq.condition, jd.condition) match {
            case (Some(a), Some(b)) =>
              val ca = conj(a).map(aligned); val cb = conj(b)
              ca.length == cb.length &&
                ca.forall(x => cb.exists(_.semanticEquals(x))) &&
                cb.forall(x => ca.exists(_.semanticEquals(x)))
            case (None, None) => true
            case _ => false
          }) && walk(jq.left, jd.left) && walk(jq.right, jd.right)
      case (a: Project, b: Project) =>
        // compute Projects: expression lists must agree pairwise (in
        // the alignment built so far); their aliases extend the map
        a.projectList.length == b.projectList.length && {
          val ok = a.projectList.zip(b.projectList).forall {
            case (x: Alias, y: Alias) =>
              aligned(x.child).semanticEquals(y.child)
            case (x: AttributeReference, y: AttributeReference) =>
              amap.get(x.exprId.id).exists(_.exprId == y.exprId)
            case _ => false
          }
          if (ok) a.projectList.zip(b.projectList).foreach {
            case (x: Alias, y: Alias) =>
              amap += (x.exprId.id -> y.toAttribute)
            case _ => ()
          }
          ok
        }
      case (_: LogicalRelation, _: LogicalRelation) =>
        true // pairwise-verified up front; lockstep keeps the pairing
      case _ => false
    }
    if (walk(q, d)) Some((amap, extras.result())) else None
  }

  /** Whole-subtree exact matching against registered exact views: any
    * node whose canonicalized form `sameResult`s a cached defining plan
    * is replaced by an MV scan aliased positionally onto the node's
    * output. Freshness is structural — the defining plan embeds the
    * chain dirs (versions) of every gvt relation it read, so a query
    * over an advanced base stops matching. Cheap prefilters (node
    * class, output types) keep the per-node cost negligible; an empty
    * exact registry short-circuits entirely. Top-down, so the largest
    * matching subtree wins. */
  private def applyExact(plan: LogicalPlan): LogicalPlan = {
    val exact = MaterializedView.exactViews
    if (exact.isEmpty) return plan
    plan.transformDown { case node =>
      exact.view.flatMap { e =>
        if (node.getClass != e.matchPlan.getClass ||
            node.output.map(_.dataType) != e.outTypes ||
            !node.sameResult(e.matchPlan)) None
        else {
          val mvPlan = MaterializedView
            .readMv(SparkSession.active, e.spec.mvRoot, e.mvVersion)
            .queryExecution.analyzed
          // differential join views carry fold-internal counter columns
          // (`_rows`, `_nn_*`) — never part of the served output
          val hidden = e.joinAgg
            .map(i => MaterializedView.internalNames(i.aggs).toSet)
            .getOrElse(Set.empty[String])
          val served = mvPlan.output.filterNot(a => hidden.contains(a.name))
          if (served.length != node.output.length) None
          else Some(Project(
            node.output.zip(served).map { case (o, m) =>
              Alias(m, o.name)(exprId = o.exprId)
            }, mvPlan))
        }
      }.headOption.getOrElse(node)
    }
  }

  /** Relation + conjoined Filter condition under attribute-only
    * Projects (same unwrap shape as [[MetaAggRewrite]]). */
  private def unwrap(plan: LogicalPlan)
      : Option[(LogicalRelation, Option[Expression])] = plan match {
    case lr: LogicalRelation => Some((lr, None))
    case Project(pl, child)
        if pl.forall(_.isInstanceOf[AttributeReference]) => unwrap(child)
    // a registered view name resolves through a SubqueryAlias; rules
    // injected ahead of alias elimination must look through it
    case SubqueryAlias(_, child) => unwrap(child)
    case Filter(cond, child) => unwrap(child).map { case (lr, f) =>
      (lr, Some(f.map(org.apache.spark.sql.catalyst.expressions.And(cond, _))
        .getOrElse(cond)))
    }
    case _ => None
  }

  /** The gvt (root, version) this relation serves: the DV relation
    * carries both; the vector-free path's FileIndex roots are the
    * chain's `v=N` dirs — the tip is the served version. */
  private def servedVersion(lr: LogicalRelation): Option[(String, Long)] =
    lr.relation match {
      case hfs: HadoopFsRelation => hfs.location match {
        case idx: GvtFileIndex if idx.tableRoot.nonEmpty =>
          val vs = idx.rootPaths.flatMap { p =>
            val n = p.getName
            if (n.startsWith("v=")) scala.util.Try(n.drop(2).toLong).toOption
            else None
          }
          if (vs.isEmpty) None else Some((idx.tableRoot, vs.max))
        case _ => None
      }
      case dv: GvtDvRelation => Some((dv.root, dv.version))
      case _ => None
    }

  private def rewrite(agg: Aggregate, groupExprs: Seq[Expression],
                      aggExprs: Seq[NamedExpression],
                      cond: Option[Expression],
                      spec: MvSpec): Option[LogicalPlan] = {
    // grouping keys: bare attributes within the MV's grouping columns
    val groupAttrs: Seq[AttributeReference] = groupExprs.map {
      case a: AttributeReference if spec.groups.contains(a.name) => a
      case _ => return None
    }
    // filter: deterministic, subquery-free, MV-group-column-only
    cond.foreach { c =>
      if (!c.deterministic || c.exists(_.isInstanceOf[SubqueryExpression]))
        return None
      if (!c.references.forall(a => spec.groups.contains(a.name))) return None
    }

    val spark = SparkSession.active
    // DISTINCT aggregates: count(distinct x) answers from the MV
    // column when the query groups EXACTLY by the MV's groups (one MV
    // row per output group), from the multiplicity SIDE table alone at
    // any grouping subset (distinct values re-aggregate exactly where
    // distinct counts cannot) — [[sideRewrite]] — and from an
    // MV ⋈ side join when the query MIXES distinct and re-aggregable
    // aggregates (the mixedRewrite below)
    val exactGrouping =
      groupAttrs.map(_.name).toSet == spec.groups.toSet
    val hasDistinct = aggExprs.exists(_.exists {
      case ae: AggregateExpression => ae.isDistinct
      case _ => false
    })

    val mvPlan = MaterializedView
      .readMv(spark, spec.mvRoot, spec.mvVersion).queryExecution.analyzed
    val mvAttr: Map[String, Attribute] =
      mvPlan.output.map(a => a.name -> a).toMap
    // registry/table drift guard: every referenced MV column must
    // exist — a miss aborts the whole rewrite via the control throw
    // (caught at the bottom), never a planning error
    def mv(name: String): Attribute =
      mvAttr.getOrElse(name, throw MvRewrite.MissingMvColumn)

    def sumOf(a: Attribute): Expression =
      Sum(a).toAggregateExpression()
    def countish(a: Attribute): Expression =
      Coalesce(Seq(sumOf(a), Literal(0L)))

    /** Map one original aggregate function to its MV re-aggregation;
      * None = shape not covered, bail out of the whole rewrite. */
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.filter.nonEmpty) return None
      if (ae.isDistinct) return ae.aggregateFunction match {
        // exact grouping (checked above): one MV row per output group,
        // so the declared count_distinct column IS the answer
        case Count(Seq(a: AttributeReference)) =>
          spec.aggs
            .find(s => s.fn == "count_distinct" && s.col == a.name)
            .map(s => Max(mv(s.out)).toAggregateExpression())
        case _ => None
      }
      ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null =>
          Some(countish(mv("_rows")))
        case Count(Seq(a: AttributeReference)) if !a.nullable =>
          Some(countish(mv("_rows")))
        case Count(Seq(a: AttributeReference)) =>
          spec.aggs.find(s => s.fn == "count" && s.col == a.name)
            .map(s => countish(mv(s.out)))
            .orElse(spec.aggs.find(s => s.fn == "sum" && s.col == a.name)
              .map(s => countish(mv(s"_nn_${s.out}"))))
        case Sum(a: AttributeReference, _) =>
          spec.aggs.find(s => s.fn == "sum" && s.col == a.name)
            .map(s => sumOf(mv(s.out)))
        case Min(a: AttributeReference) =>
          spec.aggs.find(s => s.fn == "min" && s.col == a.name)
            .map(s => Min(mv(s.out)).toAggregateExpression())
        case Max(a: AttributeReference) =>
          spec.aggs.find(s => s.fn == "max" && s.col == a.name)
            .map(s => Max(mv(s.out)).toAggregateExpression())
        case Average(a: AttributeReference, _) if ae.dataType == DoubleType =>
          // exact: total sum / total non-null count, like Average itself
          spec.aggs.find(s => s.fn == "sum" && s.col == a.name).map { s =>
            Divide(Cast(sumOf(mv(s.out)), DoubleType),
              Cast(sumOf(mv(s"_nn_${s.out}")), DoubleType))
          }
        case _ => None
      }
    }

    /** Remap an output expression onto the MV: aggregates through
      * [[mapAgg]], grouping attributes onto their MV columns, any other
      * deterministic scaffolding (casts, arithmetic, coalesce — the
      * common BI dressings like `sum(a)/count(*)`) rebuilt verbatim
      * around the mapped children. Manual recursion — a transform would
      * descend into the mapped replacements and re-visit their internal
      * aggregates. Bails (control throw) on anything else. */
    def remap(e: Expression): Expression = e match {
      case ae: AggregateExpression =>
        val mapped = mapAgg(ae).getOrElse(throw MvRewrite.MissingMvColumn)
        if (mapped.dataType != ae.dataType) throw MvRewrite.MissingMvColumn
        mapped
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        mv(a.name)
      case _: AttributeReference | _: SubqueryExpression =>
        throw MvRewrite.MissingMvColumn
      case other if !other.deterministic => throw MvRewrite.MissingMvColumn
      case other => other.withNewChildren(other.children.map(remap))
    }

    /** MIXED distinct + re-aggregable aggregates at a grouping subset:
      * re-aggregate the MV for the algebra-covered slots, the side
      * table for the distinct slots, and LEFT-join the two per-group
      * results (the MV holds every group; a group absent from the side
      * had only NULL values, so its distinct count coalesces to 0).
      * One slot column per distinct aggregate occurrence class; the
      * output scaffolding rebuilds over the join's attributes. */
    def mixedRewrite(): Option[LogicalPlan] = {
      import org.apache.spark.sql.catalyst.expressions.EqualNullSafe
      import org.apache.spark.sql.catalyst.plans.LeftOuter
      import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
      // one side table: every distinct agg must be count(distinct c)
      // over the SAME declared count_distinct column
      val distinctAggs = aggExprs.flatMap(_.collect {
        case ae: AggregateExpression if ae.isDistinct => ae })
      val cdCols = distinctAggs.map(_.aggregateFunction match {
        case Count(Seq(a: AttributeReference)) => a.name
        case _ => return None
      }).distinct
      val cd = cdCols match {
        case Seq(c) =>
          spec.aggs.find(s => s.fn == "count_distinct" && s.col == c)
            .getOrElse(return None)
        case _ => return None
      }
      val sidePlan = MaterializedView.readMv(spark,
        MaterializedView.sideRootOf(spec.mvRoot, cd.out),
        spec.sideVersions.getOrElse(cd.out, -1L)).queryExecution.analyzed
      val sideAttrMap: Map[String, Attribute] =
        sidePlan.output.map(a => a.name -> a).toMap
      def side(name: String): Attribute =
        sideAttrMap.getOrElse(name, throw MvRewrite.MissingMvColumn)

      try {
        // slot per non-distinct aggregate occurrence class (the MV
        // re-aggregation computes it once; the top project reuses it)
        val leftSlots = scala.collection.mutable
          .ArrayBuffer.empty[(AggregateExpression, String)]
        aggExprs.foreach(_.foreach {
          case ae: AggregateExpression if !ae.isDistinct =>
            if (!leftSlots.exists(_._1.semanticEquals(ae)))
              leftSlots += ae -> s"__mvl_${leftSlots.size}"
          case _ => ()
        })
        val leftChild = cond.map(c => Filter(c.transform {
          case a: AttributeReference => mv(a.name)
        }, mvPlan)).getOrElse(mvPlan)
        val left = Aggregate(groupAttrs.map(a => mv(a.name)),
          groupAttrs.map(a => mv(a.name): NamedExpression) ++
            leftSlots.map { case (ae, n) =>
              val m = mapAgg(ae).getOrElse(throw MvRewrite.MissingMvColumn)
              if (m.dataType != ae.dataType) throw MvRewrite.MissingMvColumn
              Alias(m, n)()
            }, leftChild)
        val rightChild = cond.map(c => Filter(c.transform {
          case a: AttributeReference => side(a.name)
        }, sidePlan)).getOrElse(sidePlan)
        val right = Aggregate(groupAttrs.map(a => side(a.name)),
          groupAttrs.map(a => side(a.name): NamedExpression) :+
            Alias(Count(Seq(side(cd.col): Expression))
              .toAggregateExpression(isDistinct = true), "__mvr_u")(),
          rightChild)
        val joinCond: Option[Expression] = groupAttrs.indices
          .map(i => EqualNullSafe(left.output(i), right.output(i))
            : Expression)
          .reduceOption(org.apache.spark.sql.catalyst.expressions.And(_, _))
        val joined = Join(left, right, LeftOuter,
          joinCond.orElse(Some(Literal(true))), JoinHint.NONE)
        val slotAttr: Map[String, Attribute] =
          (left.output ++ right.output).map(a => a.name -> a).toMap
        def remapTop(e: Expression): Expression = e match {
          case ae: AggregateExpression if ae.isDistinct =>
            // absent side group = all-NULL values = 0 distinct
            Coalesce(Seq(slotAttr("__mvr_u"), Literal(0L)))
          case ae: AggregateExpression =>
            leftSlots.collectFirst {
              case (s, n) if s.semanticEquals(ae) => slotAttr(n)
            }.getOrElse(throw MvRewrite.MissingMvColumn)
          case a: AttributeReference
              if groupAttrs.exists(_.exprId == a.exprId) =>
            left.output(groupAttrs.indexWhere(_.exprId == a.exprId))
          case _: AttributeReference | _: SubqueryExpression =>
            throw MvRewrite.MissingMvColumn
          case other if !other.deterministic =>
            throw MvRewrite.MissingMvColumn
          case other => other.withNewChildren(other.children.map(remapTop))
        }
        val rebuilt: Seq[NamedExpression] = aggExprs.map {
          case a: AttributeReference
              if groupAttrs.exists(_.exprId == a.exprId) =>
            Alias(left.output(groupAttrs.indexWhere(_.exprId == a.exprId)),
              a.name)(exprId = a.exprId)
          case al @ Alias(child, name) =>
            val mapped = remapTop(child)
            if (mapped.dataType != child.dataType)
              throw MvRewrite.MissingMvColumn
            Alias(mapped, name)(exprId = al.exprId)
          case _ => throw MvRewrite.MissingMvColumn
        }
        Some(Project(rebuilt, joined))
      } catch { case MvRewrite.MissingMvColumn => None }
    }

    if (hasDistinct && !exactGrouping)
      return sideRewrite(agg, groupAttrs, aggExprs, cond, spec)
        .orElse(mixedRewrite())

    try {
    val rebuilt: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(mv(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(child, name) =>
        val mapped = remap(child)
        if (mapped.dataType != child.dataType) return None // type-safety net
        Alias(mapped, name)(exprId = al.exprId)
      case _ => return None
    }

    val newChild: LogicalPlan = cond match {
      case Some(c) =>
        Filter(c.transform {
          case a: AttributeReference => mv(a.name)
        }, mvPlan)
      case None => mvPlan
    }
    val newGroups: Seq[Expression] = groupAttrs.map(a => mv(a.name))
    Some(Aggregate(newGroups, rebuilt, newChild))
    } catch { case MvRewrite.MissingMvColumn => None }
  }

  /** Rollup a DISTINCT-counting aggregate from the multiplicity SIDE
    * table: per-(MV-group, value) multiplicities re-aggregate exactly
    * at ANY grouping subset — `count(distinct x) GROUP BY G'` is the
    * side table's distinct values per G', and `count(x)` its summed
    * multiplicities — where per-group distinct COUNTS never could (two
    * fine groups may share values). Serves queries whose aggregates
    * are all count(distinct c) / count(c) over ONE declared
    * count_distinct column (one side table — mixing columns or adding
    * sums would need a join across side tables / the MV and fails
    * closed to the base scan). The filter compensation rule is the
    * same as the MV path: group-column-only predicates evaluate
    * exactly on the side rows. */
  private def sideRewrite(agg: Aggregate,
                          groupAttrs: Seq[AttributeReference],
                          aggExprs: Seq[NamedExpression],
                          cond: Option[Expression],
                          spec: MvSpec): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
    // every aggregate must be count([distinct] c) for one single
    // declared count_distinct column
    val cdCols = scala.collection.mutable.Set.empty[String]
    aggExprs.foreach(_.foreach {
      case ae: AggregateExpression => ae.aggregateFunction match {
        case Count(Seq(a: AttributeReference)) => cdCols += a.name
        case _ => return None
      }
      case _ => ()
    })
    val cd = cdCols.toSeq match {
      case Seq(c) =>
        spec.aggs.find(s => s.fn == "count_distinct" && s.col == c)
          .getOrElse(return None)
      case _ => return None
    }
    val spark = SparkSession.active
    val sidePlan = MaterializedView.readMv(spark,
      MaterializedView.sideRootOf(spec.mvRoot, cd.out),
      spec.sideVersions.getOrElse(cd.out, -1L)).queryExecution.analyzed
    val sideAttrMap: Map[String, Attribute] =
      sidePlan.output.map(a => a.name -> a).toMap
    def side(name: String): Attribute =
      sideAttrMap.getOrElse(name, throw MvRewrite.MissingMvColumn)

    def mapAgg(ae: AggregateExpression): Expression =
      ae.aggregateFunction match {
        case Count(Seq(_: AttributeReference)) if ae.isDistinct =>
          Count(Seq(side(cd.col): Expression))
            .toAggregateExpression(isDistinct = true)
        case Count(Seq(_: AttributeReference)) =>
          // count(c) over the base = total multiplicity of c's values
          Coalesce(Seq(
            Sum(side("_mult")).toAggregateExpression(), Literal(0L)))
        case _: AggregateFunction => throw MvRewrite.MissingMvColumn
      }
    def remap(e: Expression): Expression = e match {
      case ae: AggregateExpression =>
        val mapped = mapAgg(ae)
        if (mapped.dataType != ae.dataType) throw MvRewrite.MissingMvColumn
        mapped
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        side(a.name)
      case _: AttributeReference | _: SubqueryExpression =>
        throw MvRewrite.MissingMvColumn
      case other if !other.deterministic => throw MvRewrite.MissingMvColumn
      case other => other.withNewChildren(other.children.map(remap))
    }
    try {
      val rebuilt: Seq[NamedExpression] = aggExprs.map {
        case a: AttributeReference
            if groupAttrs.exists(_.exprId == a.exprId) =>
          Alias(side(a.name), a.name)(exprId = a.exprId)
        case al @ Alias(child, name) =>
          val mapped = remap(child)
          if (mapped.dataType != child.dataType)
            throw MvRewrite.MissingMvColumn
          Alias(mapped, name)(exprId = al.exprId)
        case _ => throw MvRewrite.MissingMvColumn
      }
      val newChild: LogicalPlan = cond match {
        case Some(c) => Filter(c.transform {
          case a: AttributeReference => side(a.name)
        }, sidePlan)
        case None => sidePlan
      }
      Some(Aggregate(groupAttrs.map(a => side(a.name)), rebuilt, newChild))
    } catch { case MvRewrite.MissingMvColumn => None }
  }

  /** Control-flow signal: the rewrite cannot serve this query — a spec
    * column the MV table does not carry (registry/table drift), an
    * aggregate outside the re-aggregable algebra, or an output
    * expression beyond deterministic scaffolding over mapped parts —
    * abandon the rewrite (the base scan stays). */
  private case object MissingMvColumn
    extends Throwable(null, null, false, false)
}
