package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

import graft.sources.VersionedTable
import graft.sources.gvt.{GvtDvRelation, GvtFileIndex}

/** Metadata-only aggregates over gvt tables — the Delta
  * `OptimizeMetadataOnlyDeltaQuery` analogue (delta-io/delta:
  * spark/src/.../OptimizeMetadataOnlyDeltaQuery.scala): a global
  * `Aggregate` whose every expression is answerable from table
  * METADATA collapses to a one-row [[LocalRelation]] — zero tasks,
  * zero data pages read. At 100 TB this turns `SELECT count(*)` from a
  * full-table scan into O(#files) footer reads (the same cost class as
  * planning itself), the single most common BI/monitoring query.
  *
  * What is answerable, and from where:
  *  - `count(*)` / `count(lit)` — parquet footer row counts of the
  *    snapshot's chain files (schema-only ADD COLUMNS slices skipped),
  *    minus the chain's deletion-vector cardinality on the DV-relation
  *    path ([[VersionedTable.metaRowCount]]). Row counts are MANDATORY
  *    in every parquet footer, so this never misses.
  *  - `count(col)` — equals `count(*)` for a non-nullable attribute;
  *    for nullable STRING columns the zone-map sidecar records a
  *    per-file non-null count (`nn_<col>`), summed when every file of
  *    the snapshot is covered. (Numeric zone maps carry min/max only —
  *    nullable numeric `count(col)` scans.)
  *  - `min(col)` / `max(col)` on integral columns — folded from the
  *    per-file zone maps when every file is covered, with an exactness
  *    gate: stats are stored as doubles, so a bound only folds when it
  *    round-trips the column type losslessly (|v| < 2^53 for longs).
  *    All-null files (NaN-marked stats) contribute nothing, like the
  *    aggregate itself. Float/double columns are NOT folded: an
  *    all-null file and an all-NaN file are indistinguishable in the
  *    sidecar, and NaN ordering makes the bounds unreliable. String
  *    min/max is NOT folded: collection truncates long values
  *    (truncation-sound for PRUNING, not for answering).
  *
  * Soundness boundary: the rewrite fires ONLY for a global aggregate
  * (no grouping) sitting directly on the gvt relation (optionally
  * through the optimizer's attribute-only pruning Project). Any
  * `Filter` in between, a grouping key, DISTINCT, or an aggregate
  * filter clause leaves the plan untouched. On the deletion-vector
  * relation path only `count(*)` folds — deleted rows could have
  * carried the extremes. Column-mapped chains plan through
  * [[GvtDvRelation]] (physical footer names), so stats-based min/max
  * never sees a mapped chain. Escape hatch:
  * `spark.graft.metaAgg.enabled=false`.
  */
object MetaAggRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean = SQLConf.get
    .getConfString("spark.graft.metaAgg.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        unwrap(child).flatMap(rewrite(agg, aggExprs, _)).getOrElse(agg)
    }
  }

  /** The relation under the aggregate, looking through the optimizer's
    * column-pruning Project iff it is attribute-only (no computation
    * whose removal could change semantics). */
  private def unwrap(plan: LogicalPlan): Option[LogicalRelation] = plan match {
    case lr: LogicalRelation => Some(lr)
    case Project(pl, lr: LogicalRelation)
        if pl.forall(_.isInstanceOf[AttributeReference]) => Some(lr)
    case _ => None
  }

  /** Lazily-computed metadata answers for one relation; each accessor
    * returns None when the question is not answerable from metadata
    * (→ the whole rewrite bails and the scan stands). */
  private final class Meta(count: () => Long,
                           idx: Option[GvtFileIndex]) {
    lazy val rowCount: Long = count()

    private lazy val files: Seq[String] = idx.toSeq.flatMap(_.inputFiles)
      .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath)

    def minMax(col: String, dt: DataType, isMin: Boolean): Option[Any] = {
      val zm = idx.flatMap(_.stats).getOrElse(return None)
      if (files.isEmpty) return Some(null)
      val bounds = files.map { f =>
        zm.num.get(f).flatMap(_.get(col)).getOrElse(return None)
      }
      dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          // NaN marks an all-null file (stats collection maps null
          // min/max to NaN): it contributes nothing, like the aggregate
          val live = bounds.filterNot { case (mi, ma) => mi.isNaN && ma.isNaN }
          if (live.exists { case (mi, ma) => mi.isNaN || ma.isNaN }) None
          else if (live.isEmpty) Some(null)
          else {
            val v = if (isMin) live.map(_._1).min else live.map(_._2).max
            typedBound(v, dt)
          }
        case _ => None // float/double (NaN ambiguity), strings (truncation)
      }
    }

    def nonNullCount(col: String): Option[Any] = {
      val zm = idx.flatMap(_.stats).getOrElse(return None)
      var sum = 0L
      files.foreach { f =>
        sum += zm.str.get(f).flatMap(_.get(col)).getOrElse(return None).nonNull
      }
      Some(sum)
    }
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

  private def rewrite(agg: Aggregate, aggExprs: Seq[NamedExpression],
                      lr: LogicalRelation): Option[LogicalPlan] = {
    val meta = lr.relation match {
      case hfs: HadoopFsRelation => hfs.location match {
        case idx: GvtFileIndex =>
          // vector-free, mapping-free snapshot (the relation plans this
          // path only then): footers count, zone maps answer min/max
          new Meta(() => VersionedTable.footerRowCount(idx.inputFiles.toSeq),
            Some(idx))
        case _ => return None
      }
      case dv: GvtDvRelation =>
        // pending deletion vectors: count subtracts the DV cardinality;
        // min/max could have been deleted — never folded from stats
        new Meta(() => VersionedTable.metaRowCount(dv.root, Some(dv.version)),
          None)
      case _ => return None
    }
    val vals = aggExprs.map {
      case Alias(ae: AggregateExpression, _)
          if ae.filter.isEmpty && !ae.isDistinct =>
        ae.aggregateFunction match {
          case Count(Seq(l: Literal)) if l.value != null => Some(meta.rowCount)
          case Count(Seq(a: AttributeReference)) =>
            if (!a.nullable) Some(meta.rowCount) else meta.nonNullCount(a.name)
          case Min(a: AttributeReference) => meta.minMax(a.name, a.dataType, isMin = true)
          case Max(a: AttributeReference) => meta.minMax(a.name, a.dataType, isMin = false)
          case _ => None
        }
      case _ => None
    }
    if (vals.exists(_.isEmpty)) None
    else Some(LocalRelation(agg.output,
      Seq(InternalRow.fromSeq(vals.map(_.get)))))
  }
}
