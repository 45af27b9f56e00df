package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventsStream
import graft.queries.EventQueries

/** Streaming jobs must agree with their batch-verified twins on the same
  * input (the batch versions are DuckDB-oracle-checked, so equivalence
  * transitively verifies the streaming path). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** events re-encoded at µs precision (streaming file source can't read
    * the nanos parquet either) in a tmp dir. */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft_events").toString
    EventQueries.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly window == batch hourly aggregation") {
    val q = EventsStream.hourlyWindow(EventsStream.readEventStream(spark, eventsDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("hourly_out")
      .select(col("window_start"), col("event_type"), col("n_events"),
        graft.ops.RelationalOps.rnd(col("total_value"), 2).as("tv"))
      .as[(String, String, Long, Double)].collect().toSet
    val batch = EventQueries.queries("q_events_window")(spark, "/root/testdata/sf0.001")
      .select(col("window_start"), col("event_type"), col("n_events"), col("total_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming dedup with watermark removes exact duplicates") {
    // duplicate every event by writing the input twice
    val dupDir = Files.createTempDirectory("graft_events_dup").toString
    val base = spark.read.parquet(eventsDir)
    base.write.mode("overwrite").parquet(dupDir)
    base.write.mode("append").parquet(dupDir)
    val q = EventsStream.dedupStream(
      EventsStream.readEventStream(spark, dupDir), Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val n = spark.table("dedup_out").count()
    assert(n == base.count(), "each duplicated event must appear exactly once")
  }

  test("streaming content dedup collapses re-ingested payloads with different timestamps") {
    // the same payload re-arrives later (a re-crawl): dropDuplicates on
    // (key, ts) would KEEP both rows; dropDuplicatesWithinWatermark on
    // the content key alone must collapse them
    val docsDir = Files.createTempDirectory("graft_docs_stream").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    Seq(
      (at(0), "alpha body"), (at(10), "beta body"),
      (at(20), "alpha body"),                       // re-crawl, new ts
      (at(30), "gamma body"), (at(40), "beta body") // re-crawl, new ts
    ).toDF("ts", "text").write.mode("overwrite").parquet(docsDir)
    val in = spark.readStream
      .schema("ts timestamp, text string").parquet(docsDir)
    val q = EventsStream.dedupContentStream(in, "ts", "text", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("content_dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("content_dedup_out")
      .select("text").as[String].collect().sorted
    assert(kept.toSeq == Seq("alpha body", "beta body", "gamma body"))
  }

  test("streaming text silver: dedup guard + quality filter + versioned merge") {
    import graft.sources.VersionedTable
    val src = Files.createTempDirectory("graft_textsilver_src").toString
    val ckpt = Files.createTempDirectory("graft_textsilver_ckpt").toString
    val root = Files.createTempDirectory("graft_textsilver_tbl").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    Seq(
      (1L, at(0), "alpha beta gamma delta epsilon zeta", "en"), // keep
      (2L, at(5), "tiny doc", "en"),                            // too_short
      (3L, at(10), "alpha beta gamma delta epsilon zeta", "en"), // exact dup → state
      (4L, at(15), "uno dos tres cuatro cinco seis", "de"),     // lang_mismatch
      (5L, at(20), "red orange yellow green blue indigo", "en") // keep
    ).toDF("doc_id", "ts", "text", "lang")
      .write.mode("overwrite").parquet(src)
    val in = spark.readStream
      .schema("doc_id long, ts timestamp, text string, lang string").parquet(src)
    val q = EventsStream.textSilverSink(in, root, ckpt, "1 hour")
    q.processAllAvailable(); q.stop()
    val out = VersionedTable.readLatest(spark, root)
      .select("doc_id").as[Long].collect().toSet
    // quality drops (2, 4) die; the dup pair (1, 3) collapses to ONE
    // survivor (whichever arrived first in partition order)
    assert(out.contains(5L) && !out.contains(2L) && !out.contains(4L))
    assert((out & Set(1L, 3L)).size == 1, s"dup pair must collapse, got $out")
    assert(out.size == 2)
  }

  test("late watermark-crossing replay: versioned silver converges to the batch election") {
    // A source partition is re-ingested AFTER the dedup guard's state for
    // its content keys has been evicted (the watermark crossed key-time +
    // delay): the replayed rows pass the guard, and the doc_id-keyed
    // MERGE is the second line of defense — re-upserting identical rows —
    // so the versioned table still converges to exactly the batch
    // election over the full (original + replayed) source.
    import graft.sources.VersionedTable
    val src = Files.createTempDirectory("graft_late_src").toString
    val ckpt = Files.createTempDirectory("graft_late_ckpt").toString
    val root = Files.createTempDirectory("graft_late_tbl").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    val keepA = "alpha beta gamma delta epsilon zeta"
    val keepB = "red orange yellow green blue indigo"
    def drain(): Unit = {
      val in = spark.readStream
        .schema("doc_id long, ts timestamp, text string, lang string").parquet(src)
      val q = graft.streaming.EventsStream.textSilverSink(in, root, ckpt, "1 hour")
      q.processAllAvailable(); q.stop()
    }
    // batch 1: two keeps + one quality drop
    Seq((1L, at(0), keepA, "en"), (2L, at(5), "tiny doc", "en"),
      (5L, at(10), keepB, "en"))
      .toDF("doc_id", "ts", "text", "lang").write.mode("append").parquet(src)
    drain()
    // batch 2: a fresh doc 4h later — after this batch the watermark
    // (max event time − 1h) is PAST batch 1's key expiry (ts + 1h), so
    // the guard's state for keepA/keepB is evicted
    Seq((7L, at(4 * 3600), "one two three four five six", "en"))
      .toDF("doc_id", "ts", "text", "lang").write.mode("append").parquet(src)
    drain()
    // batch 3: the late replay of docs 1 and 5 (same content, new ts,
    // above the current watermark) — the guard no longer remembers them
    Seq((1L, at(5 * 3600), keepA, "en"), (5L, at(5 * 3600 + 5), keepB, "en"))
      .toDF("doc_id", "ts", "text", "lang").write.mode("append").parquet(src)
    drain()
    val streamed = VersionedTable.readLatest(spark, root)
      .select(col("doc_id"), col("text"), col("lang"), col("n_tokens"))
      .as[(Long, String, String, Long)].collect().toSet
    // batch twin: the corpus-global election over everything ingested
    val batch = graft.queries.LlmQueries.docDecisions(
      spark.read.parquet(src).select("doc_id", "text", "lang"))
      .filter(col("in_silver"))
      .select(col("doc_id"), col("text"), col("lang"), col("n_tokens"))
      .as[(Long, String, String, Long)].collect().toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.map(_._1) == Set(1L, 5L, 7L))
    // the replay really did reach the table (merge ran), it just
    // converged: one version per non-empty micro-batch
    assert(VersionedTable.versions(root).size == 3)
  }

  test("streaming upsert sink merges each micro-batch into a new table version") {
    import org.apache.spark.sql.types._
    import graft.sources.VersionedTable
    val srcDir = Files.createTempDirectory("graft_upsert_src").toString
    val ckpt = Files.createTempDirectory("graft_upsert_ckpt").toString
    val root = Files.createTempDirectory("graft_upsert_tbl").toString
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    def drain(): Unit = {
      val q = EventsStream.upsertSink(
        spark.readStream.schema(schema).parquet(srcDir), root, Seq("id"), ckpt)
      q.processAllAvailable(); q.stop()
    }
    def latest: Map[Long, String] = VersionedTable.readLatest(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.mode("append").parquet(srcDir)
    drain()
    assert(latest == Map(1L -> "a", 2L -> "b"))
    // second CDC batch: update key 2, insert key 3; checkpoint resume
    // processes only the new files
    Seq((2L, "B"), (3L, "c")).toDF("id", "s").write.mode("append").parquet(srcDir)
    drain()
    assert(latest == Map(1L -> "a", 2L -> "B", 3L -> "c"))
    assert(VersionedTable.versions(root) == Seq(1L, 2L)) // one snapshot per batch
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 2) // time travel intact
  }

  test("streaming aggregate maintenance: additive merge, exactly-once replay, zero-count drop") {
    import graft.sources.VersionedTable
    val root = Files.createTempDirectory("graft_aggview").toString
    def view: Map[String, (Long, Long)] = VersionedTable.readLatest(spark, root)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b0 = Seq(("A", 1L, 10L), ("A", 1L, 20L), ("B", 1L, 5L))
      .toDF("grp", "op", "measure")
    EventsStream.applyAggDelta(root, b0, 0L)
    assert(view == Map("A" -> (2L, 30L), "B" -> (1L, 5L)))
    // batch 1: insert C, retract B's only row -> B must drop out of the view
    val b1 = Seq(("C", 1L, 7L), ("B", -1L, 5L)).toDF("grp", "op", "measure")
    EventsStream.applyAggDelta(root, b1, 1L)
    assert(view == Map("A" -> (2L, 30L), "C" -> (1L, 7L)))
    // checkpoint replay re-delivers the same batch id: additive state
    // would double-apply, so the committed id must make it a no-op
    EventsStream.applyAggDelta(root, b1, 1L)
    assert(view == Map("A" -> (2L, 30L), "C" -> (1L, 7L)))
    assert(VersionedTable.versions(root).size == 2, "replay must not write a snapshot")
    // compaction must carry the applied-batch watermark into the new
    // live version — otherwise a post-compaction replay double-applies
    VersionedTable.compact(spark, root)
    EventsStream.applyAggDelta(root, b1, 1L)
    assert(view == Map("A" -> (2L, 30L), "C" -> (1L, 7L)),
      "replay after compaction must still be a no-op")
    // out-of-order retraction (no matching insert yet): the negative
    // count stays visible as retraction debt...
    EventsStream.applyAggDelta(root, Seq(("E", -1L, 9L)).toDF("grp", "op", "measure"), 2L)
    assert(view("E") == (-1L, -9L), "early retraction must not be dropped")
    // ...and the view converges to net zero once the insert lands
    EventsStream.applyAggDelta(root, Seq(("E", 1L, 9L)).toDF("grp", "op", "measure"), 3L)
    assert(!view.contains("E"), "insert + earlier retraction must net out")
  }

  test("streaming aggregate-maintenance sink: per-batch snapshots through a real stream") {
    import org.apache.spark.sql.types._
    import graft.sources.VersionedTable
    val srcDir = Files.createTempDirectory("graft_aggm_src").toString
    val ckpt = Files.createTempDirectory("graft_aggm_ckpt").toString
    val root = Files.createTempDirectory("graft_aggm_tbl").toString
    val schema = StructType(Seq(StructField("grp", StringType),
      StructField("op", LongType), StructField("measure", LongType)))
    def drain(): Unit = {
      val q = EventsStream.aggMaintSink(
        spark.readStream.schema(schema).parquet(srcDir), root, ckpt)
      q.processAllAvailable(); q.stop()
    }
    def view: Map[String, (Long, Long)] = VersionedTable.readLatest(spark, root)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    Seq(("A", 1L, 10L), ("B", 1L, 4L), ("A", 1L, 30L))
      .toDF("grp", "op", "measure").write.mode("append").parquet(srcDir)
    drain()
    assert(view == Map("A" -> (2L, 40L), "B" -> (1L, 4L)))
    // second changelog batch after checkpoint resume: retraction + insert
    Seq(("A", -1L, 10L), ("D", 1L, 3L))
      .toDF("grp", "op", "measure").write.mode("append").parquet(srcDir)
    drain()
    assert(view == Map("A" -> (1L, 30L), "B" -> (1L, 4L), "D" -> (1L, 3L)))
    assert(VersionedTable.versions(root) == Seq(1L, 2L)) // one snapshot per batch
  }

  test("streaming IVF ingestion: appended batches probe like a batch-built index") {
    import graft.llm.IvfIndex
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val src = Files.createTempDirectory("graft_ivfstream_src").toString
    val ckpt = Files.createTempDirectory("graft_ivfstream_ckpt").toString
    val idx = Files.createTempDirectory("graft_ivfstream_idx").toString + "/ivf"
    def drain(): Unit = {
      val in = spark.readStream.schema(e.schema).parquet(src)
      val q = EventsStream.ivfAppendSink(in, cents, idx, ckpt)
      q.processAllAvailable(); q.stop()
    }
    // two ingestion waves land as two micro-batch appends
    e.filter(col("vec_id") % 2 === 0).write.mode("append").parquet(src)
    drain()
    e.filter(col("vec_id") % 2 =!= 0).write.mode("append").parquet(src)
    drain()
    val full = Files.createTempDirectory("graft_ivfstream_full").toString
    IvfIndex.build(e, cents, full)
    def probed(path: String) =
      IvfIndex.probe(spark, path, cents, e.filter(col("vec_id") === 0L), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(probed(idx) == probed(full))
    assert(spark.read.parquet(idx).count() == e.count())
  }

  test("stream-stream time-range join == equivalent batch join") {
    val stream = EventsStream.readEventStream(spark, eventsDir)
    val q = EventsStream.purchaseAttribution(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attr_out")
      .select("purchase_id", "click_id")
      .as[(Long, Long)].collect().toSet

    val batch = EventsStream.purchaseAttribution(
      spark.read.parquet(eventsDir)) // same plan, batch source
      .select("purchase_id", "click_id")
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("sessionize with event-time timeout flushes open tails == ALL batch sessions") {
    // sentinel event far past the data advances the watermark beyond every
    // real session's (last event + gap), so each open tail times out and
    // is emitted; only the sentinel user's own session stays in state
    val flushDir = Files.createTempDirectory("graft_events_flush").toString
    val base = spark.read.parquet(eventsDir)
    base.write.mode("overwrite").parquet(flushDir)
    val maxTs = base.agg(max(col("ts"))).head.getTimestamp(0)
    Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000), -1L, "flush", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(flushDir)

    val stream = EventsStream.readEventStream(spark, flushDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventsStream.Event]
    val q = EventsStream.sessionizeWithTimeout(stream, 1800L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_flush_out")
      .start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("sessions_flush_out")
      .filter(col("user_id") >= 0L)
      .select(col("user_id"), col("session_id"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet

    val batchAll = EventQueries.sessionize(
      EventQueries.events(spark, "/root/testdata/sf0.001"), 1800L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_id").cast("long"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batchAll && streamed.nonEmpty)
  }

  test("streaming sessionization == batch sessions (excluding open tails)") {
    val stream = EventsStream.readEventStream(spark, eventsDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventsStream.Event]
    val q = EventsStream.sessionize(stream, 1800L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("sessions_out")
      .select(col("user_id"), col("session_id"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet

    val batchAll = EventQueries.sessionize(
      EventQueries.events(spark, "/root/testdata/sf0.001"), 1800L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_id").cast("long"), col("n_events"))
      .as[(Long, Long, Long)].collect()
    // drop each user's last (still-open) session — the stream keeps it in state
    val openTails = batchAll.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val batchClosed = batchAll.filterNot { case (u, s, _) => openTails(u) == s }.toSet
    assert(streamed == batchClosed && streamed.nonEmpty)
  }

  /** The maintained view's current (grp, n, sum_measure) rows. */
  private def viewRows(view: String): Set[(String, Long, Long)] =
    graft.sources.VersionedTable.readLatest(spark, view)
      .select(col("grp"), col("n"), col("sum_measure"))
      .as[(String, Long, Long)].collect().toSet

  /** The from-scratch rebuild of the source's LATEST snapshot aggregate. */
  private def rebuiltAgg(src: String): Set[(String, Long, Long)] =
    graft.sources.VersionedTable.readLatest(spark, src)
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .as[(String, Long, Long)].collect().toSet

  private def ordersKGC(): org.apache.spark.sql.DataFrame =
    graft.sources.Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))

  test("change-feed drain maintains an aggregate view == batch rebuild across commits") {
    import graft.sources.VersionedTable
    import graft.streaming.ChangeFeed
    val dir = Files.createTempDirectory("graft_cdf_stream").toString
    val src = s"$dir/src"; val view = s"$dir/view"
    val o = ordersKGC()
    val v1 = o.filter(col("k") % 10 =!= 0)
    VersionedTable.write(v1, src)
    // first commit = all-inserts micro-batch
    assert(ChangeFeed.drainAggChanges(spark, src, Seq("k"), "prio", "cents", view) == 1)
    assert(viewRows(view) == rebuiltAgg(src))

    // two MORE commits land before the next poll: deletes + updates +
    // inserts, then further deletes — the drain must apply both, in order
    val v2 = o.filter(col("k") % 10 === 0 ||
        (col("k") % 10 =!= 0 && col("k") % 97 =!= 0))
      .withColumn("cents", when(col("k") % 10 =!= 0 && col("k") % 7 === 0,
        col("cents") + 100000L).otherwise(col("cents")))
    VersionedTable.write(v2, src)
    VersionedTable.write(v2.filter(col("k") % 13 =!= 0), src)
    assert(ChangeFeed.drainAggChanges(spark, src, Seq("k"), "prio", "cents", view) == 2)
    assert(viewRows(view) == rebuiltAgg(src))

    // caught up: a re-poll (or a crashed-and-restarted consumer — the
    // cursor lives in the view snapshot itself) applies nothing
    assert(ChangeFeed.drainAggChanges(spark, src, Seq("k"), "prio", "cents", view) == 0)
    assert(viewRows(view) == rebuiltAgg(src))
  }

  test("appendSink lands each micro-batch as one O(batch) append commit") {
    import graft.sources.VersionedTable
    val root = Files.createTempDirectory("graft_append_sink").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_append_ckpt").toString
    // multi-file input so maxFilesPerTrigger=1 yields several micro-batches
    val srcDir = Files.createTempDirectory("graft_append_src").toString
    spark.read.parquet(eventsDir).repartition(4)
      .write.mode("overwrite").parquet(srcDir)
    val src = spark.readStream.schema(EventsStream.eventSchema)
      .option("maxFilesPerTrigger", "1") // one input file per micro-batch
      .parquet(srcDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val q = EventsStream.appendSink(src, root, ckpt)
    q.processAllAvailable(); q.stop()
    val total = spark.read.parquet(eventsDir).count()
    assert(VersionedTable.readLatest(spark, root).count() == total)
    val ops = VersionedTable.history(spark, root)
      .select("operation").as[String].collect()
    assert(ops.count(_ == "APPEND") >= 1,
      s"multi-batch ingestion must use APPEND commits, got ${ops.toSeq}")
    // every event ingested exactly once
    assert(VersionedTable.readLatest(spark, root)
      .select("event_id").distinct().count() == total)
    // the chain folds into one full snapshot on compaction
    VersionedTable.compact(spark, root, targetFileBytes = 1L << 30)
    assert(VersionedTable.readLatest(spark, root).count() == total)
  }

  test("change-feed JOIN-view drain: counting IVM across commits on both sides == rebuild") {
    import graft.sources.VersionedTable
    import graft.streaming.ChangeFeed
    val dir = Files.createTempDirectory("graft_cdfj_stream").toString
    val (ra, rb, view) = (s"$dir/a", s"$dir/b", s"$dir/view")
    val o = graft.sources.Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        col("o_orderstatus").as("status"))
    val c = graft.sources.Tables.t(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("segment"))
    def drain(): Int = ChangeFeed.drainJoinChanges(
      spark, ra, Seq("k"), rb, Seq("ck"), Seq("ck"), view)
    def viewRows(): Set[(Long, Long, String, String, Long)] =
      VersionedTable.readLatest(spark, view)
        .select(col("k"), col("ck"), col("status"), col("segment"), col("_cnt"))
        .as[(Long, Long, String, String, Long)].collect().toSet
    def rebuild(): Set[(Long, Long, String, String, Long)] =
      VersionedTable.readLatest(spark, ra)
        .join(VersionedTable.readLatest(spark, rb), Seq("ck"))
        .select(col("k"), col("ck"), col("status"), col("segment"),
          lit(1L).as("_cnt"))
        .as[(Long, Long, String, String, Long)].collect().toSet

    // bootstrap: first commits on both sides arrive before the first poll
    VersionedTable.write(o.filter(col("k") % 10 =!= 0), ra)
    VersionedTable.write(c.filter(col("ck") % 5 =!= 0), rb)
    assert(drain() == 2)
    assert(viewRows() == rebuild() && viewRows().nonEmpty)
    // deletes + updates + inserts on BOTH sides before one poll
    VersionedTable.write(o.filter(col("k") % 97 =!= 0)
      .withColumn("status",
        when(col("k") % 7 === 0, lit("U")).otherwise(col("status"))), ra)
    VersionedTable.write(c.filter(col("ck") % 13 =!= 0)
      .withColumn("segment",
        when(col("ck") % 11 === 0, lit("U")).otherwise(col("segment"))), rb)
    assert(drain() == 2)
    assert(viewRows() == rebuild())
    // one-sided commit; then a caught-up poll applies nothing
    VersionedTable.write(c.filter(col("ck") % 13 =!= 0 && col("ck") % 3 =!= 0), rb)
    assert(drain() == 1)
    assert(viewRows() == rebuild())
    assert(drain() == 0)
  }

  test("JOIN-view drain before the other side exists: no-op poll, full catch-up later") {
    import graft.sources.VersionedTable
    import graft.streaming.ChangeFeed
    val dir = Files.createTempDirectory("graft_cdfj_onesided").toString
    val (ra, rb, view) = (s"$dir/a", s"$dir/b", s"$dir/view")
    val o = ordersKGC().select(col("k"),
      (col("k") % 100).as("ck"), col("prio").as("status"))
    val c = o.select(col("ck")).distinct().withColumn("segment", lit("S"))
    def drain(): Int = ChangeFeed.drainJoinChanges(
      spark, ra, Seq("k"), rb, Seq("ck"), Seq("ck"), view)
    // two B commits land while A has never been written: the poll must
    // not crash, must write nothing, and must NOT advance cursors
    VersionedTable.write(c.filter(col("ck") % 2 === 0), rb)
    VersionedTable.write(c, rb)
    assert(drain() == 0)
    assert(VersionedTable.latestVersion(view).isEmpty)
    // A's first commit arrives: one poll catches the view fully up
    VersionedTable.write(o, ra)
    assert(drain() >= 1)
    val got = VersionedTable.readLatest(spark, view)
      .select(col("k"), col("ck"), col("status"), col("segment"))
      .as[(Long, Long, String, String)].collect().toSet
    val want = VersionedTable.readLatest(spark, ra)
      .join(VersionedTable.readLatest(spark, rb), Seq("ck"))
      .select(col("k"), col("ck"), col("status"), col("segment"))
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("joinMaintSink converges to the join rebuild while both sides commit") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_cdfj_sink").toString
    val (ra, rb, view) = (s"$dir/a", s"$dir/b", s"$dir/view")
    val o = ordersKGC().select(col("k"),
      (col("k") % 50).as("ck"), col("prio").as("status"))
    val c = o.select(col("ck")).distinct().withColumn("segment", lit("S"))
    VersionedTable.write(o.filter(col("k") % 10 =!= 0), ra)
    VersionedTable.write(c.filter(col("ck") % 2 === 0), rb)
    val q = graft.streaming.ChangeFeed.joinMaintSink(
      spark, ra, Seq("k"), rb, Seq("ck"), Seq("ck"), view, intervalMs = 200L)
    try {
      // both sides move while the ticker runs
      VersionedTable.write(o.filter(col("k") % 97 =!= 0), ra)
      VersionedTable.write(c, rb)
      val want = VersionedTable.readLatest(spark, ra)
        .join(VersionedTable.readLatest(spark, rb), Seq("ck"))
        .select(col("k"), col("ck")).as[(Long, Long)].collect().toSet
      val deadline = System.currentTimeMillis + 60000L
      var ok = false
      while (!ok && System.currentTimeMillis < deadline) {
        ok = VersionedTable.latestVersion(view).isDefined &&
          VersionedTable.readLatest(spark, view)
            .select(col("k"), col("ck")).as[(Long, Long)].collect().toSet == want
        if (!ok) Thread.sleep(200L)
      }
      assert(ok, "streaming join view did not converge to the rebuild")
    } finally q.stop()
  }

  test("changeFeedMaintSink converges to the batch rebuild while a writer commits") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_cdf_sink").toString
    val src = s"$dir/src"; val view = s"$dir/view"
    val o = ordersKGC()
    VersionedTable.write(o.filter(col("k") % 10 =!= 0), src)
    val q = graft.streaming.ChangeFeed.changeFeedMaintSink(
      spark, src, Seq("k"), "prio", "cents", view, intervalMs = 200L)
    try {
      // commit while the ticker runs; the view must converge within a
      // few trigger intervals
      VersionedTable.write(o.filter(col("k") % 97 =!= 0), src)
      val want = rebuiltAgg(src)
      val deadline = System.currentTimeMillis + 60000L
      var ok = false
      while (!ok && System.currentTimeMillis < deadline) {
        ok = VersionedTable.latestVersion(view).isDefined &&
          viewRows(view) == want
        if (!ok) Thread.sleep(200L)
      }
      assert(ok, "streaming consumer's view did not converge to the batch rebuild")
    } finally q.stop()
  }

  // ── Round 9: append fast path, retention guard, crash-restart e2e ──

  test("commit feed drains APPEND commits at O(batch): no snapshot join in the plan") {
    import graft.sources.VersionedTable
    import graft.streaming.ChangeFeed
    val dir = Files.createTempDirectory("graft_cdf_fast").toString
    val src = s"$dir/src"; val view = s"$dir/view"
    val o = ordersKGC()
    VersionedTable.write(o.filter(col("k") % 3 === 0), src)
    VersionedTable.append(o.filter(col("k") % 3 === 1), src)
    VersionedTable.append(o.filter(col("k") % 3 === 2), src)
    // drain the bootstrap commit so the cursor sits at v1
    VersionedTable.write(
      VersionedTable.readVersion(spark, src, 1L)
        .groupBy(col("prio").as("grp"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_measure")),
      view, metaFiles = Map("_batch" -> "1"))
    val feeds = ChangeFeed.commitFeeds(spark, src, Seq("k"), fromV = 1L)
    assert(feeds.map(_._1) == Seq(2L, 3L))
    feeds.foreach { case (v, feed) =>
      val plan = feed.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("join"),
        s"append commit v=$v must drain without a snapshot diff join:\n$plan")
      assert(feed.inputFiles.forall(_.contains(s"/v=$v/")),
        s"append commit v=$v must scan only its batch dir")
    }
    // and the drained view still equals the batch rebuild
    assert(ChangeFeed.drainAggChanges(spark, src, Seq("k"), "prio", "cents", view) == 2)
    assert(viewRows(view) == rebuiltAgg(src))
  }

  test("vacuum past a consumer's cursor fails the drain loudly, never double-counts") {
    import graft.sources.VersionedTable
    import graft.streaming.ChangeFeed
    val dir = Files.createTempDirectory("graft_cdf_horizon").toString
    val src = s"$dir/src"; val view = s"$dir/view"
    val o = ordersKGC()
    VersionedTable.write(o.filter(col("k") % 10 =!= 0), src)
    assert(ChangeFeed.drainAggChanges(spark, src, Seq("k"), "prio", "cents", view) == 1)
    val before = viewRows(view)
    // two more commits land, then retention reclaims EVERYTHING below
    // the new head — the consumer's cursor (v1) is now unreachable
    VersionedTable.write(o.filter(col("k") % 97 =!= 0), src)
    VersionedTable.write(o.filter(col("k") % 97 =!= 0 && col("k") % 13 =!= 0), src)
    VersionedTable.vacuum(src, keep = 1, orphanGraceMs = 0L, retainMinMs = 0L)
    intercept[ChangeFeed.CursorBehindRetention] {
      ChangeFeed.drainAggChanges(spark, src, Seq("k"), "prio", "cents", view)
    }
    // the view was NOT corrupted by synthetic re-inserts
    assert(viewRows(view) == before)
    // a FRESH consumer (cursor 0) may still bootstrap from the earliest
    // retained snapshot — that is a valid full refresh, not a replay
    val view2 = s"$dir/view2"
    assert(ChangeFeed.drainAggChanges(spark, src, Seq("k"), "prio", "cents", view2) == 1)
    assert(viewRows(view2) == rebuiltAgg(src))
  }

  test("joinMaintSink kill + restart mid-stream: re-derives cursors, converges, no double-apply") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_cdfj_crash").toString
    val (ra, rb, view) = (s"$dir/a", s"$dir/b", s"$dir/view")
    val o = ordersKGC().select(col("k"),
      (col("k") % 50).as("ck"), col("prio").as("status"))
    val c = o.select(col("ck")).distinct().withColumn("segment", lit("S"))
    def rebuild(): Set[(Long, Long)] =
      VersionedTable.readLatest(spark, ra)
        .join(VersionedTable.readLatest(spark, rb), Seq("ck"))
        .select(col("k"), col("ck")).as[(Long, Long)].collect().toSet
    def converged(want: Set[(Long, Long)]): Boolean = {
      val deadline = System.currentTimeMillis + 60000L
      var ok = false
      while (!ok && System.currentTimeMillis < deadline) {
        ok = VersionedTable.latestVersion(view).isDefined &&
          VersionedTable.readLatest(spark, view)
            .select(col("k"), col("ck")).as[(Long, Long)].collect().toSet == want
        if (!ok) Thread.sleep(200L)
      }
      ok
    }
    VersionedTable.write(o.filter(col("k") % 10 =!= 0), ra)
    VersionedTable.write(c.filter(col("ck") % 2 === 0), rb)
    val q1 = graft.streaming.ChangeFeed.joinMaintSink(
      spark, ra, Seq("k"), rb, Seq("ck"), Seq("ck"), view, intervalMs = 200L)
    try assert(converged(rebuild()), "pre-kill convergence")
    finally q1.stop() // KILL: the ticker dies with cursors inside the view snapshot
    // commits land while no sink is running (the crash window)
    VersionedTable.write(o.filter(col("k") % 97 =!= 0), ra)
    VersionedTable.write(c, rb)
    // restart from nothing but the view itself — no external checkpoint
    val q2 = graft.streaming.ChangeFeed.joinMaintSink(
      spark, ra, Seq("k"), rb, Seq("ck"), Seq("ck"), view, intervalMs = 200L)
    try assert(converged(rebuild()), "post-restart convergence")
    finally q2.stop()
    // a replayed poll after the restart applies nothing (exactly-once)
    assert(graft.streaming.ChangeFeed.drainJoinChanges(
      spark, ra, Seq("k"), rb, Seq("ck"), Seq("ck"), view) == 0)
    // multiplicities are all-positive and the view matches the rebuild
    assert(VersionedTable.readLatest(spark, view)
      .filter(col("_cnt") <= 0).count() == 0)
  }
}
