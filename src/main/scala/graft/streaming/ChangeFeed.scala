package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.VersionedTable

/** Change-feed STREAMING source over a snapshot-versioned table — the
  * Delta `readStream.option("readChangeFeed", true)` analogue on the
  * plain-parquet [[VersionedTable]] (the reference's every write rides
  * Delta's transaction log, 01_bronze_ingest.py:96-102; this exposes
  * the same commits-as-a-stream surface without the Delta jars).
  *
  * Model: each COMMITTED version of the source table is one micro-batch.
  * A consumer holds a cursor = the last source version it applied; a
  * poll diffs each newer committed version against its chain
  * predecessor ([[VersionedTable.changes]] — one co-partitioned join
  * per commit, the base never rescanned) and feeds the per-commit
  * changelog downstream in chain order.
  *
  * Exactly-once without a side channel: when the downstream is a
  * maintained aggregate view ([[EventsStream.applyAggDelta]]), the
  * cursor IS the `_batch` id the view commits atomically inside each
  * of its own snapshots — crash anywhere between apply and the next
  * poll simply re-derives the cursor from the view and re-applies
  * nothing (applyAggDelta no-ops on `batchId ≤ applied`). There is no
  * separate offset file to fall out of sync.
  */
object ChangeFeed {

  /** Per-commit change feed of every committed version in `(fromV, ∞)`,
    * in chain order: (version, changelog) pairs, where the changelog is
    * [[VersionedTable.changes]] of that commit against its predecessor.
    * The table's FIRST commit (no predecessor) is emitted as
    * all-`insert` rows of the snapshot itself. Lazy: each DataFrame is
    * a plan, nothing is executed here. */
  def commitFeeds(spark: SparkSession, srcRoot: String, keys: Seq[String],
                  fromV: Long): Seq[(Long, DataFrame)] = {
    val chain = VersionedTable.committedVersions(srcRoot)
    chain.zip(None +: chain.init.map(Some(_)))
      .filter { case (v, _) => v > fromV }
      .map {
        case (v, Some(p)) =>
          v -> VersionedTable.changes(spark, srcRoot, p, v, keys)
        case (v, None) =>
          v -> VersionedTable.readVersion(spark, srcRoot, v)
            .withColumn("_change_type", lit("insert"))
      }
  }

  /** CDF row → changelog op: inserts and update postimages add, deletes
    * and update preimages retract. */
  val changeOp: org.apache.spark.sql.Column =
    when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))

  /** Drain every unapplied commit of `srcRoot` into the maintained
    * aggregate view at `viewRoot`: per commit, the change feed is
    * projected to (grp = `grpCol`, op, measure = `measureCol`) and
    * merged by [[EventsStream.applyAggDelta]] with batchId = the SOURCE
    * version — one atomic view snapshot per source commit, replay-safe.
    * Returns the number of commits applied (0 = already caught up).
    *
    * Cost per poll: one gold-sized merge join per NEW commit plus one
    * snapshot-diff join per new commit; a caught-up poll is pure
    * metadata (one chain read + one meta read). */
  def drainAggChanges(spark: SparkSession, srcRoot: String, keys: Seq[String],
                      grpCol: String, measureCol: String,
                      viewRoot: String): Int = {
    val cursor = VersionedTable.latestVersion(viewRoot)
      .flatMap(v => VersionedTable.readMeta(viewRoot, v, "_batch"))
      .map(_.trim.toLong).getOrElse(0L)
    val pending = commitFeeds(spark, srcRoot, keys, cursor)
    pending.foreach { case (v, feed) =>
      EventsStream.applyAggDelta(viewRoot,
        feed.select(col(grpCol).as("grp"), changeOp.as("op"),
          col(measureCol).cast("long").as("measure")), v)
    }
    pending.size
  }

  /** The fully-streaming CDF→MV pipeline: a processing-time ticker
    * (rate source — no data rides it, it only schedules polls) drives
    * [[drainAggChanges]], so every commit a writer lands on `srcRoot`
    * flows into the maintained view within one trigger interval.
    * Stopping and restarting the query is safe at any point — the
    * cursor lives in the view's own snapshots, not in the stream
    * checkpoint. */
  def changeFeedMaintSink(spark: SparkSession, srcRoot: String,
                          keys: Seq[String], grpCol: String,
                          measureCol: String, viewRoot: String,
                          intervalMs: Long = 1000L): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (_: DataFrame, _: Long) =>
        drainAggChanges(spark, srcRoot, keys, grpCol, measureCol, viewRoot)
        ()
      }
      .start()
}
