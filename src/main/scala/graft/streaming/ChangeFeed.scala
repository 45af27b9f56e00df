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
  * poll feeds each newer committed version's changelog downstream in
  * chain order ([[VersionedTable.changes]]). An APPEND commit — the
  * dominant streaming-ingestion shape — drains at O(batch): its
  * changelog is the batch directory itself, all-insert, no join (the
  * changes() fast path). A rewrite commit (merge/DELETE/UPDATE) costs
  * one co-partitioned diff join of the two snapshots.
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
    * all-`insert` rows of the snapshot itself — a valid bootstrap ONLY
    * for a fresh consumer (`fromV == 0`). A consumer whose cursor has
    * fallen behind the vacuum horizon (the earliest RETAINED version
    * has no predecessor but the cursor is > 0 and older than it) gets
    * [[CursorBehindRetention]] instead: emitting the earliest snapshot
    * as synthetic inserts on top of a view that already absorbed the
    * vacuumed commits would silently double-count every surviving row
    * (Delta likewise errors when CDF is requested before the earliest
    * available version). Lazy: each DataFrame is a plan, nothing is
    * executed here. */
  def commitFeeds(spark: SparkSession, srcRoot: String, keys: Seq[String],
                  fromV: Long): Seq[(Long, DataFrame)] = {
    val chain = VersionedTable.committedVersions(srcRoot)
    if (chain.isEmpty) return Seq.empty // table not yet created
    chain.zip(None +: chain.init.map(Some(_)))
      .filter { case (v, _) => v > fromV }
      .map {
        case (v, Some(p)) =>
          v -> VersionedTable.changes(spark, srcRoot, p, v, keys)
        case (v, None) if fromV > 0 =>
          throw new CursorBehindRetention(
            s"$srcRoot: earliest retained version v=$v exceeds consumer " +
              s"cursor $fromV (vacuumed past the cursor) — full refresh required")
        case (v, None) =>
          v -> VersionedTable.readVersion(spark, srcRoot, v)
            .withColumn("_change_type", lit("insert"))
      }
  }

  /** The change-feed consumer's cursor predates the earliest retained
    * source version: the feed cannot be reconstructed — rebuild the
    * downstream view from scratch (and vacuum the source with a
    * `retainMinMs` covering the consumer's poll interval). */
  class CursorBehindRetention(msg: String) extends IllegalStateException(msg)

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
    // chain-walking read: an interleaved non-sink commit on the view
    // (e.g. a compact without carried meta) must not hide the cursor
    val cursor = VersionedTable.readMetaLatest(viewRoot, "_batch")
      .map(_.trim.toLong).getOrElse(0L)
    val pending = commitFeeds(spark, srcRoot, keys, cursor)
    pending.foreach { case (v, feed) =>
      EventsStream.applyAggDelta(viewRoot,
        feed.select(col(grpCol).as("grp"), changeOp.as("op"),
          col(measureCol).cast("long").as("measure")), v)
    }
    pending.size
  }

  /** Drain every unapplied commit of TWO versioned sources into a
    * maintained JOIN view V = A ⋈ B at `viewRoot` — the streaming twin
    * of q_cdf_join_refresh's counting IVM. Serialization: all pending B
    * commits apply first, each ΔB joined against A at ITS cursor (A did
    * not move during B's chain), then all pending A commits, each ΔA
    * joined against B's NEW head — exactly the signed algebra
    * ΔV = A_old ⋈ ΔB ∪ ΔA ⋈ B_new, whose sum telescopes to
    * A_new ⋈ B_new − A_old ⋈ B_old. The view stores net row
    * multiplicities in `_cnt` (the general counting representation — a
    * non-key-unique join is still exact), merged by one full-row signed
    * aggregate per poll; rows netting to 0 vanish.
    *
    * Exactly-once: BOTH cursors (`_batch_a`, `_batch_b`) commit inside
    * the single view snapshot a poll writes — crash anywhere re-derives
    * the same poll from the same cursors (pure recompute, nothing
    * half-applied). Returns commits applied (0 = caught up, no view
    * write). */
  def drainJoinChanges(spark: SparkSession,
                       srcA: String, keysA: Seq[String],
                       srcB: String, keysB: Seq[String],
                       joinCols: Seq[String], viewRoot: String): Int = {
    def cursor(name: String): Long = VersionedTable.readMetaLatest(viewRoot, name)
      .map(_.trim.toLong).getOrElse(0L)
    val (curA, curB) = (cursor("_batch_a"), cursor("_batch_b"))
    val feedsA = commitFeeds(spark, srcA, keysA, curA)
    val feedsB = commitFeeds(spark, srcB, keysB, curB)
    if (feedsA.isEmpty && feedsB.isEmpty) return 0
    val aOld = if (curA > 0) Some(VersionedTable.readVersion(spark, srcA, curA)) else None
    // pinned to the last DRAINED B version, not latestVersion(srcB): a B
    // commit landing mid-poll would otherwise ride into ΔA ⋈ B_new now
    // and again when its own feed drains next poll (double count)
    val bHead = feedsB.lastOption.map(_._1)
      .orElse(Some(curB).filter(_ > 0))
      .map(v => VersionedTable.readVersion(spark, srcB, v))
    // view columns: join key once, then each side's data columns
    val aCols = (feedsA.headOption.map(_._2).orElse(aOld))
      .map(_.columns.filterNot(c => c == "_change_type" || joinCols.contains(c)).toSeq)
      .getOrElse(Seq.empty)
    val bCols = (feedsB.headOption.map(_._2).orElse(bHead))
      .map(_.columns.filterNot(c => c == "_change_type" || joinCols.contains(c)).toSeq)
      .getOrElse(Seq.empty)
    val dataCols = joinCols ++ aCols ++ bCols
    val terms =
      feedsB.flatMap { case (_, feed) =>
        aOld.map(_.join(feed.withColumn("op", changeOp), joinCols))
      } ++
      feedsA.flatMap { case (_, feed) =>
        bHead.map(feed.withColumn("op", changeOp).join(_, joinCols))
      }
    // commits on one source while the OTHER side has never been written
    // produce no delta terms (an empty join side): correct result is an
    // unchanged view, and the cursors must NOT advance — when the missing
    // side's first commit arrives, ΔA ⋈ B_head replays the skipped B
    // commits' effect in full
    if (terms.isEmpty) return 0
    val sel = (dataCols.map(col) :+ col("op")).toSeq
    val oldRows = VersionedTable.latestVersion(viewRoot) match {
      case Some(v) => VersionedTable.readVersion(spark, viewRoot, v)
        .select(dataCols.map(col) :+ col("_cnt").as("op"): _*)
      case None => terms.head.select(sel: _*).limit(0)
    }
    val merged = terms.map(_.select(sel: _*))
      .foldLeft(oldRows)(_ unionByName _)
      .groupBy(dataCols.map(col): _*)
      .agg(sum(col("op")).as("_cnt"))
      .filter(col("_cnt") =!= 0)
    VersionedTable.write(merged, viewRoot, allowEvolution = true,
      metaFiles = Map(
        "_batch_a" -> feedsA.lastOption.map(_._1).getOrElse(curA).toString,
        "_batch_b" -> feedsB.lastOption.map(_._1).getOrElse(curB).toString),
      operation = "CDF_JOIN_REFRESH")
    feedsA.size + feedsB.size
  }

  /** A processing-time ticker (rate source — no data rides it, it only
    * schedules polls) driving an arbitrary poll body. Stopping and
    * restarting is safe at any point for both maintained-view drains —
    * their cursors live in the view's own snapshots, not in the stream
    * checkpoint. */
  private def tickerSink(spark: SparkSession, intervalMs: Long)
                        (poll: () => Unit): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (_: DataFrame, _: Long) => poll() }
      .start()

  /** The fully-streaming CDF→aggregate-MV pipeline: every commit a
    * writer lands on `srcRoot` flows into the maintained view within
    * one trigger interval via [[drainAggChanges]]. */
  def changeFeedMaintSink(spark: SparkSession, srcRoot: String,
                          keys: Seq[String], grpCol: String,
                          measureCol: String, viewRoot: String,
                          intervalMs: Long = 1000L): StreamingQuery =
    tickerSink(spark, intervalMs) { () =>
      drainAggChanges(spark, srcRoot, keys, grpCol, measureCol, viewRoot)
      ()
    }

  /** The fully-streaming CDF→join-MV pipeline: commits on EITHER side
    * flow into the maintained join view within one trigger interval via
    * [[drainJoinChanges]]. */
  def joinMaintSink(spark: SparkSession,
                    srcA: String, keysA: Seq[String],
                    srcB: String, keysB: Seq[String],
                    joinCols: Seq[String], viewRoot: String,
                    intervalMs: Long = 1000L): StreamingQuery =
    tickerSink(spark, intervalMs) { () =>
      drainJoinChanges(spark, srcA, keysA, srcB, keysB, joinCols, viewRoot)
      ()
    }
}
