package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Safety rule: SQL `INSERT INTO` against a gvt relation would plan as
  * a plain file write INTO the resolved snapshot's version directories
  * — bypassing the commit protocol entirely (no new version, no schema
  * gate, no marker, and a corrupted live snapshot). A gvt relation is
  * read-only at the SQL layer; writes go through
  * `df.write.format("gvt")` / `VersionedTable.*`, which commit
  * atomically. Injected via [[graft.GraftExtensions]]; recognized by
  * the relation's [[graft.sources.gvt.GvtFileIndex]] location. */
object GvtInsertGuard extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case i: InsertIntoStatement => i.table.foreach {
        case LogicalRelation(r: HadoopFsRelation, _, _, _, _)
            if r.location.isInstanceOf[graft.sources.gvt.GvtFileIndex] =>
          throw new UnsupportedOperationException(
            "INSERT INTO a gvt relation would bypass the versioned commit " +
              "protocol (it writes raw files into the snapshot directory). " +
              "Use df.write.format(\"gvt\").mode(\"append\"|\"overwrite\") " +
              "or the VersionedTable API instead.")
        case _ => ()
      }
      case _ => ()
    }
    plan
  }
}
