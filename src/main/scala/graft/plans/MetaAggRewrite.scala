package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BoundReference, Expression, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

import graft.sources.VersionedTable
import graft.sources.gvt.{GvtDvRelation, GvtFileIndex}

/** Metadata-only aggregates over gvt tables — the Delta
  * `OptimizeMetadataOnlyDeltaQuery` analogue (delta-io/delta:
  * spark/src/.../OptimizeMetadataOnlyDeltaQuery.scala): an `Aggregate`
  * whose every expression is answerable from table METADATA collapses
  * to a [[LocalRelation]] — zero tasks, zero data pages read. At
  * 100 TB this turns `SELECT count(*)`, `SELECT max(event_date)`, and
  * `SELECT dt, count(*) GROUP BY dt` from full-table scans into
  * O(#files) footer reads (the same cost class as planning itself) —
  * the three most common BI/monitoring shapes.
  *
  * What is answerable, and from where:
  *  - `count(*)` / `count(lit)` — parquet footer row counts of the
  *    snapshot's chain files (schema-only ADD COLUMNS slices skipped),
  *    minus the chain's deletion-vector cardinality on the DV-relation
  *    path ([[VersionedTable.metaRowCount]]). Row counts are MANDATORY
  *    in every parquet footer, so this never misses.
  *  - `count(col)` — equals `count(*)` for a non-nullable attribute;
  *    for PARTITION columns the null rows live under the hive default
  *    partition, so the count sums the non-null dirs' footers; for
  *    nullable STRING data columns the zone-map sidecar records a
  *    per-file non-null count (`nn_<col>`), summed when every file of
  *    the snapshot is covered. (Numeric zone maps carry min/max only —
  *    nullable numeric `count(col)` scans.)
  *  - `min(col)` / `max(col)` on PARTITION columns — folded from the
  *    partition directory values (exact by construction), over dirs
  *    that actually hold rows (a zero-row dir's value hosts nothing).
  *  - `min(col)` / `max(col)` on integral data columns — folded from
  *    the per-file zone maps when every file is covered, with an
  *    exactness gate: stats are stored as doubles, so a bound only
  *    folds when it round-trips the column type losslessly (|v| < 2^53
  *    for longs). All-null files (NaN-marked stats) contribute
  *    nothing, like the aggregate itself. Float/double columns are NOT
  *    folded: an all-null file and an all-NaN file are
  *    indistinguishable in the sidecar, and NaN ordering makes the
  *    bounds unreliable. String data-column min/max is NOT folded:
  *    collection truncates long values (truncation-sound for PRUNING,
  *    not for answering).
  *  - `GROUP BY <partition cols>` — the same answers per group: dirs
  *    grouped by their partition values, footer counts and zone maps
  *    restricted to each group's files. Zero-row groups emit no row,
  *    exactly like the aggregate they replace.
  *
  * Soundness boundary: the rewrite fires ONLY for an aggregate whose
  * grouping keys (if any) are bare partition-column attributes,
  * sitting on the gvt relation through at most the optimizer's
  * attribute-only pruning Projects and `Filter`s over PARTITION
  * columns alone (every row of a directory shares its values, so
  * dir-level predicate evaluation is exact — `count(*) WHERE
  * date >= X` stays a metadata read). A filter touching any data
  * column, a non-partition grouping key, DISTINCT, or an aggregate
  * filter clause leaves the plan untouched. On the deletion-vector
  * relation path only global `count(*)` folds — deleted rows could
  * have carried the extremes, and per-partition DV attribution is not
  * tracked. Column-mapped chains plan through [[GvtDvRelation]]
  * (physical footer names), so stats-based min/max never sees a mapped
  * chain. Escape hatch: `spark.graft.metaAgg.enabled=false`.
  */
object MetaAggRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean = SQLConf.get
    .getConfString("spark.graft.metaAgg.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        unwrap(child).flatMap { case (lr, cond) =>
          rewrite(agg, groupExprs, aggExprs, lr, cond)
        }.getOrElse(agg)
    }
  }

  /** The relation under the aggregate plus an optional Filter whose
    * predicate the rewrite may still be able to answer (partition
    * columns only — checked at the use site against the index), looking
    * through the optimizer's column-pruning Projects iff attribute-only
    * (no computation whose removal could change semantics). Multiple
    * Filters conjoin; anything else stops the unwrap. */
  private def unwrap(plan: LogicalPlan)
      : Option[(LogicalRelation, Option[Expression])] = plan match {
    case lr: LogicalRelation => Some((lr, None))
    case Project(pl, child)
        if pl.forall(_.isInstanceOf[AttributeReference]) => unwrap(child)
    case Filter(cond, child) => unwrap(child).map { case (lr, f) =>
      (lr, Some(f.map(org.apache.spark.sql.catalyst.expressions.And(cond, _))
        .getOrElse(cond)))
    }
    case _ => None
  }

  /** Reconstruct a typed bound from its double-stored stat, only when
    * the round-trip is provably lossless — a long at |v| ≥ 2^53 has
    * neighbors that collapse to the same double, so the stored stat no
    * longer identifies the true extreme. */
  private[graft] def typedBound(v: Double, dt: DataType): Option[Any] = dt match {
    case LongType =>
      val l = v.toLong
      if (l.toDouble == v && math.abs(v) < 9007199254740992.0) Some(l) else None
    case IntegerType =>
      if (v == math.rint(v) && v >= Int.MinValue && v <= Int.MaxValue)
        Some(v.toInt) else None
    case ShortType =>
      if (v == math.rint(v) && v >= Short.MinValue && v <= Short.MaxValue)
        Some(v.toShort) else None
    case ByteType =>
      if (v == math.rint(v) && v >= Byte.MinValue && v <= Byte.MaxValue)
        Some(v.toByte) else None
    case _ => None
  }

  private def rewrite(agg: Aggregate, groupExprs: Seq[_],
                      aggExprs: Seq[NamedExpression],
                      lr: LogicalRelation,
                      cond: Option[Expression]): Option[LogicalPlan] =
    lr.relation match {
      case hfs: HadoopFsRelation => hfs.location match {
        case idx: GvtFileIndex =>
          // vector-free, mapping-free snapshot (the relation plans this
          // path only then): footers count, partition values and zone
          // maps answer min/max
          rewriteFiles(agg, groupExprs, aggExprs, idx, cond)
        case _ => None
      }
      case dv: GvtDvRelation if groupExprs.isEmpty && cond.isEmpty =>
        rewriteDvGlobal(agg, aggExprs, dv)
      case _ => None
    }

  /** Pending deletion vectors: only the global row count is
    * metadata-answerable (footers minus DV cardinality); the deleted
    * rows could have carried any extreme or non-null value. */
  private def rewriteDvGlobal(agg: Aggregate, aggExprs: Seq[NamedExpression],
                              dv: GvtDvRelation): Option[LogicalPlan] = {
    lazy val n = VersionedTable.metaRowCount(dv.root, Some(dv.version))
    val vals = aggExprs.map {
      case Alias(ae: AggregateExpression, _)
          if ae.filter.isEmpty && !ae.isDistinct =>
        ae.aggregateFunction match {
          case Count(Seq(l: Literal)) if l.value != null => Some(n)
          case Count(Seq(a: AttributeReference)) if !a.nullable => Some(n)
          case _ => None
        }
      case _ => None
    }
    if (vals.exists(_.isEmpty)) None
    else Some(LocalRelation(agg.output,
      Seq(InternalRow.fromSeq(vals.map(_.get)))))
  }

  /** One partition directory of the snapshot: its (possibly empty)
    * partition values, data files, and exact footer row count. */
  private final case class DirInfo(values: InternalRow, files: Seq[String],
                                   rows: Long)

  private def rewriteFiles(agg: Aggregate, groupExprs: Seq[_],
                           aggExprs: Seq[NamedExpression],
                           idx: GvtFileIndex,
                           cond: Option[Expression]): Option[LogicalPlan] = {
    val pSchema = idx.partitionSchema
    // a Filter is answerable iff it references ONLY partition columns,
    // deterministically and subquery-free: every row of a directory
    // shares its partition values, so dir-level evaluation of the
    // predicate is EXACT (not merely conservative) — `count(*) WHERE
    // date >= X` stays a metadata read
    val dirPred: Option[InternalRow => Boolean] = cond.map { c =>
      if (!c.deterministic || c.exists(_.isInstanceOf[SubqueryExpression]))
        return None
      if (!c.references.forall(a => pSchema.fieldNames.contains(a.name)))
        return None
      val bound = c.transform {
        case a: AttributeReference =>
          val i = pSchema.fieldNames.indexOf(a.name)
          BoundReference(i, pSchema(i).dataType, nullable = true)
      }
      (row: InternalRow) => bound.eval(row) == true // null = filtered out
    }
    // grouping keys (if any) must be bare partition-column attributes
    val groupAttrs: Seq[AttributeReference] = groupExprs.map {
      case a: AttributeReference if pSchema.fieldNames.contains(a.name) => a
      case _ => return None
    }
    // cheap answerability pre-check before any footer IO: every agg
    // expression must be a shape this rule can even attempt
    val attemptable = aggExprs.forall {
      case a: AttributeReference => groupAttrs.exists(_.exprId == a.exprId)
      case Alias(a: AttributeReference, _) =>
        groupAttrs.exists(_.exprId == a.exprId)
      case Alias(ae: AggregateExpression, _)
          if ae.filter.isEmpty && !ae.isDistinct =>
        ae.aggregateFunction match {
          case Count(_) | Min(_) | Max(_) => true
          case _ => false
        }
      case _ => false
    }
    if (!attemptable) return None

    val dirs: Seq[DirInfo] = idx.listFiles(Nil, Nil)
      .filter(pd => dirPred.forall(_(pd.values)))
      .map { pd =>
        val fs = pd.files.map(_.getPath.toString)
        DirInfo(pd.values, fs, VersionedTable.footerRowCount(fs))
      }
    val zm = idx.stats

    def partIdx(a: AttributeReference): Option[Int] = {
      val i = pSchema.fieldNames.indexOf(a.name)
      if (i >= 0) Some(i) else None
    }

    /** Answer every aggregate expression over one dir subset (a group,
      * or the whole snapshot); `keyOf` resolves grouping attributes. */
    def evalRow(info: Seq[DirInfo],
                keyOf: AttributeReference => Option[Any]): Option[InternalRow] = {
      val rowCount = info.map(_.rows).sum
      // dirs that actually hold rows: a zero-row dir's partition value
      // hosts nothing and must not sway min/max or non-null counts
      val live = info.filter(_.rows > 0)
      lazy val files = live.flatMap(_.files)
        .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath)

      def partVal(i: Int, d: DirInfo): Any = d.values.get(i, pSchema(i).dataType)

      def partMinMax(a: AttributeReference, isMin: Boolean): Option[Any] =
        partIdx(a).flatMap { i =>
          val vs = live.map(partVal(i, _)).filter(_ != null)
          if (vs.isEmpty) Some(null)
          else {
            val ord = TypeUtils.getInterpretedOrdering(pSchema(i).dataType)
            Some(if (isMin) vs.min(ord) else vs.max(ord))
          }
        }

      def statMinMax(a: AttributeReference, isMin: Boolean): Option[Any] = {
        val maps = zm.getOrElse(return None)
        if (files.isEmpty) return Some(null)
        val bounds = files.map { f =>
          maps.num.get(f).flatMap(_.get(a.name)).getOrElse(return None)
        }
        a.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            // NaN marks an all-null file (stats collection maps null
            // min/max to NaN): it contributes nothing, like the agg
            val liveB = bounds.filterNot { case (mi, ma) => mi.isNaN && ma.isNaN }
            if (liveB.exists { case (mi, ma) => mi.isNaN || ma.isNaN }) None
            else if (liveB.isEmpty) Some(null)
            else typedBound(
              if (isMin) liveB.map(_._1).min else liveB.map(_._2).max,
              a.dataType)
          case _ => None // float/double (NaN ambiguity), strings (truncation)
        }
      }

      def nonNullCount(a: AttributeReference): Option[Any] =
        partIdx(a) match {
          case Some(i) => // null rows live under the hive default partition
            Some(live.filter(d => partVal(i, d) != null).map(_.rows).sum)
          case None =>
            val maps = zm.getOrElse(return None)
            var sum = 0L
            files.foreach { f =>
              sum += maps.str.get(f).flatMap(_.get(a.name))
                .getOrElse(return None).nonNull
            }
            Some(sum)
        }

      val vals = aggExprs.map {
        case a: AttributeReference => keyOf(a)
        case Alias(a: AttributeReference, _) => keyOf(a)
        case Alias(ae: AggregateExpression, _) =>
          ae.aggregateFunction match {
            case Count(Seq(l: Literal)) if l.value != null => Some(rowCount)
            case Count(Seq(a: AttributeReference)) =>
              if (!a.nullable) Some(rowCount) else nonNullCount(a)
            case Min(a: AttributeReference) =>
              keyOf(a).map(Some(_)).getOrElse(
                if (partIdx(a).isDefined) partMinMax(a, isMin = true)
                else statMinMax(a, isMin = true))
            case Max(a: AttributeReference) =>
              keyOf(a).map(Some(_)).getOrElse(
                if (partIdx(a).isDefined) partMinMax(a, isMin = false)
                else statMinMax(a, isMin = false))
            case _ => None
          }
        case _ => None
      }
      if (vals.exists(_.isEmpty)) None
      else Some(InternalRow.fromSeq(vals.map(_.get)))
    }

    if (groupAttrs.isEmpty) {
      // global: exactly one output row, even over an empty snapshot
      evalRow(dirs, _ => None).map(r => LocalRelation(agg.output, Seq(r)))
    } else {
      // grouped: one row per distinct live key — zero-row groups (and
      // an empty table) emit nothing, exactly like the real aggregate
      val keyIdx = groupAttrs.map(a => pSchema.fieldNames.indexOf(a.name))
      val groups = dirs.filter(_.rows > 0)
        .groupBy(d => keyIdx.map(i => d.values.get(i, pSchema(i).dataType)))
      val rows = groups.toSeq.map { case (key, info) =>
        val keyOf: AttributeReference => Option[Any] = a => {
          val gi = groupAttrs.indexWhere(_.exprId == a.exprId)
          if (gi >= 0) Some(key(gi)) else None
        }
        evalRow(info, keyOf).getOrElse(return None)
      }
      Some(LocalRelation(agg.output, rows))
    }
  }
}
