package graft.layers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps._
import graft.sources.VersionedTable

/** Incremental silver refresh — the capability the reference's
  * full-refresh pipeline (mode("overwrite") everywhere) lacks and any
  * production lakehouse needs: apply a bronze CHANGESET through the same
  * dedup → gate → enrich discipline, then MERGE it into a
  * snapshot-versioned silver table instead of rewriting the layer.
  *
  * At 100 TB this is the difference between re-shuffling 33M+ (or 10¹¹)
  * rows per run and processing only the day's increment: the merge
  * anti-join broadcasts the changeset keys against the target scan, and
  * the versioned write keeps time travel + atomic reader flips.
  * Quality gates run ON THE INCREMENT (per-batch contract); a gate breach
  * raises before any write, leaving the current snapshot untouched.
  */
object IncrementalSilver {

  /** Bootstrap: full-refresh the enriched silver orders table as v1. */
  def bootstrap(spark: SparkSession, root: String, bronzeOrders: DataFrame,
                cfg: Medallion.Config): Long = {
    val deduped = dedupFirst(bronzeOrders, Seq("order_id"),
      Seq(col("user_id"), col("order_number")))
    Medallion.gateSilverOrders(deduped, cfg, "silver-inc")
    VersionedTable.write(Medallion.enrichOrders(deduped), root)
  }

  /** Apply one bronze orders changeset: dedup within the batch, gate it
    * (the SAME battery as the full refresh — Medallion.gateSilverOrders),
    * enrich it, MERGE by order_id into a new snapshot. Returns the new
    * version number. `allowEvolution` lets a changeset introduce new
    * nullable columns into the silver schema (`mergeSchema` analogue) —
    * existing rows read NULL for them; type changes are always rejected. */
  def applyIncrement(spark: SparkSession, root: String, increment: DataFrame,
                     cfg: Medallion.Config, allowEvolution: Boolean = false): Long = {
    val deduped = dedupFirst(increment, Seq("order_id"),
      Seq(col("user_id"), col("order_number")))
    Medallion.gateSilverOrders(deduped, cfg, "silver-inc")
    VersionedTable.merge(spark, root, Medallion.enrichOrders(deduped),
      Seq("order_id"), allowEvolution = allowEvolution)
  }
}
