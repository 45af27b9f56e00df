package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.IncrementalDedup
import graft.sources.VersionedTable

/** Incremental dedup against a persisted gvt fingerprint index: the
  * batch-over-batch ingestion contract (bucket-min intra-batch, index
  * anti-join cross-batch), index growth, and idempotent re-ingest. */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def fp(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("fp", md5(col("text")))

  test("exact: cross-batch and intra-batch duplicates drop; the index " +
    "grows by accepted docs only; re-ingest is a full drop") {
    val idx = fresh("incdedup")
    val b1 = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val a1 = IncrementalDedup.ingest(spark, idx, fp(b1), Seq("fp"))
    assert(a1.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(VersionedTable.readLatest(spark, idx).count() == 2)
    val b2 = Seq(
      (3L, "a b c"),  // cross dup of doc 1
      (4L, "g h i"),  // fresh
      (5L, "g h i"),  // intra dup of doc 4 (smaller id wins)
      (6L, "d e f")   // cross dup of doc 2
    ).toDF("doc_id", "text")
    val a2 = IncrementalDedup.ingest(spark, idx, fp(b2), Seq("fp"))
    assert(a2.select("doc_id").as[Long].collect().toSet == Set(4L))
    // index: one row per accepted doc's band
    val ix = VersionedTable.readLatest(spark, idx)
    assert(ix.count() == 3)
    assert(ix.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    // idempotency: re-ingesting an already-accepted corpus drops all
    val a3 = IncrementalDedup.ingest(spark, idx,
      fp(Seq((7L, "a b c"), (8L, "g h i")).toDF("doc_id", "text")), Seq("fp"))
    assert(a3.isEmpty)
    assert(VersionedTable.readLatest(spark, idx).count() == 3)
    // one atomic gvt commit per batch that accepted anything; the
    // fully-deduped re-ingest committed nothing
    assert(VersionedTable.committedVersions(idx).size == 2)
  }

  test("ingest evaluates the caller's signature expressions exactly " +
    "once per row (materialized before the melt and the anti-join)") {
    val idx = fresh("incdedup1x")
    val acc = spark.sparkContext.longAccumulator("sig_evals")
    val counting = udf { (s: String) => acc.add(1L); s }
    val batch = Seq((1L, "k1"), (2L, "k2"), (3L, "k1")).toDF("doc_id", "raw")
      .withColumn("fp", counting(col("raw")))
    val a = IncrementalDedup.ingest(spark, idx, batch, Seq("fp"))
    a.collect() // drain the returned frame like a caller would
    // one evaluation per input row: the band melt, the accepted
    // anti-join and the caller all read the materialized signature
    // table instead of re-running the expression
    assert(acc.value == 3L, s"signature expressions ran ${acc.value} " +
      "times for 3 rows — the frame is being re-evaluated")
  }

  test("banded: ANY shared band drops; bucket-min resolves chains " +
    "deterministically (documented: drops the whole chain tail)") {
    val idx = fresh("incdedupb")
    // bands as plain columns: A(x,p) B(x,y) C(q,y) — B collides with A
    // on band0, C collides with B on band1: bucket-min drops BOTH B and
    // C (C's band1 bucket min is B regardless of B's own fate)
    val batch = Seq(
      (10L, "x", "p"), (11L, "x", "y"), (12L, "q", "y"), (13L, "r", "s")
    ).toDF("doc_id", "band0", "band1")
    val a = IncrementalDedup.ingest(spark, idx, batch, Seq("band0", "band1"))
    assert(a.select("doc_id").as[Long].collect().toSet == Set(10L, 13L))
    // a later batch colliding on EITHER band of an accepted doc drops
    val b2 = Seq((20L, "zz", "p"), (21L, "r", "zz2"), (22L, "f", "g"))
      .toDF("doc_id", "band0", "band1")
    val a2 = IncrementalDedup.ingest(spark, idx, b2, Seq("band0", "band1"))
    assert(a2.select("doc_id").as[Long].collect().toSet == Set(22L))
    // the index is hive-partitioned by band_id (the scale layout)
    assert(VersionedTable.partColsOf(new org.apache.hadoop.fs.Path(
      s"$idx/v=1")) == Seq("band_id"))
  }

  test("streaming corpus dedup: foreachBatch ingestReplaySafe is " +
    "exactly-once across every crash point") {
    val dir = Files.createTempDirectory("graft_incstream").toString
    val (idx, corpus) = (s"$dir/idx", s"$dir/corpus")
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
        IncrementalDedup.ingestReplaySafe(spark, idx, corpus,
          fp(df), Seq("fp"), "dedup_stream", bid)
      }.start()
    try {
      in.addData((1L, "a b"), (2L, "c d")); q.processAllAvailable()
      in.addData((3L, "a b"), (4L, "e f")); q.processAllAvailable() // 3 dups 1
      assert(VersionedTable.readLatest(spark, corpus)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    } finally q.stop()
    // crash-point replays, driven directly:
    // (a) full replay of an applied batch: both watermarks skip it
    IncrementalDedup.ingestReplaySafe(spark, idx, corpus,
      fp(Seq((3L, "a b"), (4L, "e f")).toDF("doc_id", "text")),
      Seq("fp"), "dedup_stream", 1L)
    assert(VersionedTable.readLatest(spark, corpus).count() == 3)
    // (b) crash BETWEEN index and corpus commits: simulate by ingesting
    // batch 2's bands with the txn stamp but no corpus append — the
    // replay must RECOVER the accepted set from the index (recomputing
    // would dedup the batch against its own bands and lose doc 5)
    val b2 = fp(Seq((5L, "g h"), (6L, "a b")).toDF("doc_id", "text"))
    IncrementalDedup.ingest(spark, idx, b2, Seq("fp"),
      txn = Some("dedup_stream" -> 2L))
    IncrementalDedup.ingestReplaySafe(spark, idx, corpus, b2,
      Seq("fp"), "dedup_stream", 2L)
    val live = VersionedTable.readLatest(spark, corpus)
    assert(live.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L, 5L))
    // corpus rows carry the doc columns, not the fingerprint
    assert(live.columns.toSeq == Seq("doc_id", "text"))
    // (c) a second replay of the recovered batch is a no-op
    IncrementalDedup.ingestReplaySafe(spark, idx, corpus, b2,
      Seq("fp"), "dedup_stream", 2L)
    assert(VersionedTable.readLatest(spark, corpus).count() == 4)
  }

  test("model-based: random batch sequences match the brute-force " +
    "two-rule model; auto-compaction never changes the answer") {
    val rnd = new scala.util.Random(11L)
    for (trial <- 1 to 3) {
      val idx = fresh(s"incmodel$trial")
      // small alphabet forces real collisions; two bands per doc
      def band() = s"b${rnd.nextInt(6)}"
      var nextId = 0L
      var model = Vector.empty[(Long, String, String)] // accepted (id, b0, b1)
      for (batchNo <- 1 to 4) {
        val docs = (1 to (3 + rnd.nextInt(5))).map { _ =>
          nextId += 1; (nextId, band(), band())
        }
        val accepted = IncrementalDedup.ingest(spark, idx,
          docs.toDF("doc_id", "band0", "band1"), Seq("band0", "band1"),
          autoCompactEvery = if (trial == 2) 2 else 0)
          .select("doc_id").as[Long].collect().toSet
        // brute-force model — collisions are per band POSITION (band_id
        // + value), matching the operator's (band_id, band) key: rule
        // (a) any position shared with a previously ACCEPTED doc; rule
        // (b) any position shared with a smaller-id same-batch doc
        val expect = docs.filter { case (id, b0, b1) =>
          !model.exists { case (_, a0, a1) => b0 == a0 || b1 == a1 } &&
            !docs.exists { case (id2, c0, c1) =>
              id2 < id && (b0 == c0 || b1 == c1) }
        }
        assert(accepted == expect.map(_._1).toSet,
          s"trial $trial batch $batchNo: got $accepted, model ${expect.map(_._1)}")
        model ++= expect
      }
      // the index equals the model's accepted bands exactly
      val ix = VersionedTable.readLatest(spark, idx)
        .select("doc_id").as[Long].collect().toSeq
      assert(ix.sorted == model.flatMap(m => Seq(m._1, m._1)).sorted)
    }
  }

  test("the cross-batch probe broadcasts the BATCH, never shuffles the index") {
    val idx = fresh("incplan")
    IncrementalDedup.ingest(spark, idx,
      (1L to 50L).map(i => (i, s"b$i")).toDF("doc_id", "band0"), Seq("band0"))
    // capture the probe plan shape by re-running a batch and inspecting
    // the accepted frame's lineage is checkpoint-truncated, so probe the
    // crossHit shape directly: an index ⋈ broadcast(batch) inner join
    val bb = IncrementalDedup.meltBands(
      (51L to 60L).map(i => (i, s"b${i % 55}")).toDF("doc_id", "band0"),
      Seq("band0"))
    val index = VersionedTable.readLatest(spark, idx)
      .select(col("band_id"), col("band"))
    val probe = IncrementalDedup.crossProbe(index, bb,
      bbBytes = 1024L, broadcastBytes = 64L << 20)
    probe.collect()
    // AQE query stages hide their subtree from collect(), so assert on
    // the FINAL plan's rendering
    def render(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
    val plan = render(probe)
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast hash probe:\n$plan")
    // the index side reaches the join without a shuffle exchange
    assert(!plan.contains("ShuffleExchange") &&
      !plan.contains("Exchange hashpartitioning"),
      s"the index was shuffled:\n$plan")
  }

  test("a batch past the byte ceiling takes the shuffle join, never an " +
    "oversized broadcast; the sizing itself reads the block manager") {
    val idx = fresh("incplanbig")
    IncrementalDedup.ingest(spark, idx,
      (1L to 50L).map(i => (i, s"b$i")).toDF("doc_id", "band0"), Seq("band0"))
    val bb = IncrementalDedup.meltBands(
      (51L to 60L).map(i => (i, s"b${i % 55}")).toDF("doc_id", "band0"),
      Seq("band0"))
    val index = VersionedTable.readLatest(spark, idx)
      .select(col("band_id"), col("band"))
    // byte size over the ceiling → the batch must NOT be broadcast by
    // our own hint (Spark's AQE may still pick a broadcast for a frame
    // this tiny — assert the HINT is absent from the optimized plan)
    val big = IncrementalDedup.crossProbe(index, bb,
      bbBytes = (64L << 20) + 1, broadcastBytes = 64L << 20)
    val hinted = big.queryExecution.analyzed.collectFirst {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
    }
    assert(hinted.isEmpty, "the over-ceiling batch was broadcast-hinted")
    // correctness is path-independent: both paths return the same hits
    val small = IncrementalDedup.crossProbe(index, bb, 0L, 64L << 20)
    assert(big.as[Long].collect().sorted.toSeq ==
      small.as[Long].collect().sorted.toSeq)
    // the real sizing: a checkpointed batch's bytes are visible and
    // positive; a non-checkpointed frame reports None (→ shuffle path)
    val ck = bb.localCheckpoint()
    val sz = IncrementalDedup.checkpointedBytes(spark, ck)
    assert(sz.exists(_ > 0L), s"checkpointed batch size not found: $sz")
    assert(IncrementalDedup.checkpointedBytes(spark, bb).isEmpty)
  }

  test("NULL fingerprints never match anything (and are not indexed)") {
    val idx = fresh("incdedupn")
    val batch = Seq((1L, Some("x")), (2L, None), (3L, None))
      .toDF("doc_id", "band0")
    val a = IncrementalDedup.ingest(spark, idx, batch, Seq("band0"))
    assert(a.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(VersionedTable.readLatest(spark, idx).count() == 1)
  }
}
