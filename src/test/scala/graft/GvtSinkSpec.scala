package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** `df.writeStream.format("gvt")`: one atomic versioned commit per
  * micro-batch — Append → O(batch) append commits, Complete →
  * full-snapshot overwrite, Update → key merge; the applied batch id
  * commits inside each snapshot (replay guard). */
class GvtSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("append mode lands each micro-batch as one append commit with a batch watermark") {
    val dir = Files.createTempDirectory("graft_gvtsink").toString
    val root = s"$dir/t"
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Int]
    val q = in.toDF().select(col("value").as("id"))
      .writeStream.format("gvt").option("path", root)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      in.addData(1 to 10: _*); q.processAllAvailable()
      in.addData(11 to 15: _*); q.processAllAvailable()
      assert(VersionedTable.readLatest(spark, root)
        .as[Int].collect().toSet == (1 to 15).toSet)
      val ops = VersionedTable.history(spark, root)
        .select("operation").as[String].collect().toSeq
      assert(ops.count(_ == "APPEND") == 1 && ops.count(_ == "WRITE") == 1)
      // the batch dir holds only its delta (O(batch) commit)
      assert(spark.read.parquet(s"$root/v=2").count() == 5)
      // the applied watermark rides the snapshot
      assert(VersionedTable.readMetaLatest(root, "_batch").isDefined)
    } finally q.stop()
  }

  test("autoCompactEvery folds the append chain once it reaches the threshold") {
    val dir = Files.createTempDirectory("graft_gvtsink_ac").toString
    val root = s"$dir/t"
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Int]
    val q = in.toDF().select(col("value").as("id"))
      .writeStream.format("gvt").option("path", root)
      .option("autoCompactEvery", "3")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      for (b <- 0 until 4) { in.addData(b * 10 + 1 to b * 10 + 10: _*); q.processAllAvailable() }
      // batches 1-2 append; batch 3 reaches chain length 3 → the sink
      // FOLDS the batch dirs (base files never rewritten)
      val ops = VersionedTable.history(spark, root)
        .select("operation").as[String].collect().toSeq
      assert(ops.contains("COMPACT_CHAIN"), s"expected auto-compaction, got $ops")
      assert(VersionedTable.readLatest(spark, root).count() == 40)
      // the watermark survived the fold — a replayed batch still no-ops
      assert(VersionedTable.readMetaLatest(root, "_batch").isDefined)
    } finally q.stop()
  }

  test("complete mode overwrites the maintained aggregate snapshot per batch") {
    val dir = Files.createTempDirectory("graft_gvtsink_c").toString
    val root = s"$dir/t"
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Int]
    val agg = in.toDF().select((col("value") % 3).as("grp"))
      .groupBy("grp").agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("gvt").option("path", root)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      in.addData(1 to 9: _*); q.processAllAvailable()
      assert(VersionedTable.readLatest(spark, root)
        .as[(Long, Long)].collect().toMap == Map(0L -> 3L, 1L -> 3L, 2L -> 3L))
      in.addData(12, 15) // two more grp=0
      q.processAllAvailable()
      assert(VersionedTable.readLatest(spark, root)
        .as[(Long, Long)].collect().toMap == Map(0L -> 5L, 1L -> 3L, 2L -> 3L))
      // each batch = one atomic full snapshot; the previous stays
      // time-travelable
      assert(VersionedTable.committedVersions(root).size >= 2)
    } finally q.stop()
  }

  test("update mode merges micro-batches by key; missing keys option is rejected") {
    val dir = Files.createTempDirectory("graft_gvtsink_u").toString
    val root = s"$dir/t"
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val q = in.toDF().select(col("_1").as("k"), col("_2").as("v"))
      .writeStream.outputMode("update")
      .format("gvt").option("path", root).option("keys", "k")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      in.addData((1, "a"), (2, "b")); q.processAllAvailable()
      in.addData((2, "B"), (3, "c")); q.processAllAvailable()
      assert(VersionedTable.readLatest(spark, root)
        .as[(Int, String)].collect().toMap == Map(1 -> "a", 2 -> "B", 3 -> "c"))
    } finally q.stop()
    intercept[IllegalArgumentException] {
      in.toDF().writeStream.outputMode("update")
        .format("gvt").option("path", s"$dir/t2")
        .option("checkpointLocation", s"$dir/ckpt2").start()
    }
  }

  test("update mode commits conditionally: an external commit between batches survives") {
    val dir = Files.createTempDirectory("graft_gvtsink_cc").toString
    val root = s"$dir/t"
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val q = in.toDF().select(col("_1").as("k"), col("_2").as("v"))
      .writeStream.outputMode("update")
      .format("gvt").option("path", root).option("keys", "k")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      in.addData((1, "a"), (2, "b")); q.processAllAvailable()
      // an EXTERNAL writer commits between two micro-batches
      VersionedTable.merge(spark, root, Seq((100, "ext")).toDF("k", "v"), Seq("k"))
      in.addData((2, "B")); q.processAllAvailable()
      // both the external row and the update survive
      assert(VersionedTable.readLatest(spark, root)
        .as[(Int, String)].collect().toMap ==
        Map(1 -> "a", 2 -> "B", 100 -> "ext"))
      // the update batches committed through merge() — conditional on
      // the snapshot they read (MERGE ops in history), with the batch
      // watermark riding the merged snapshot atomically
      val ops = VersionedTable.history(spark, root)
        .select("operation").as[String].collect().toSeq
      assert(ops.count(_ == "MERGE") >= 2, s"update batches must merge: $ops")
      assert(VersionedTable.readMeta(root,
        VersionedTable.latestVersion(root).get, "_batch").map(_.trim) == Some("1"))
    } finally q.stop()
  }

  test("racing merges each land their own metaFiles watermark through the retry") {
    val root = Files.createTempDirectory("graft_gvtsink_race").toString + "/t"
    VersionedTable.write(Seq((1, "a")).toDF("k", "v"), root)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq("A" -> Seq((2, "b")), "B" -> Seq((3, "c"))).map { case (app, rows) =>
      new Thread(() => {
        try VersionedTable.merge(spark, root, rows.toDF("k", "v"), Seq("k"),
          metaFiles = Map(VersionedTable.txnKey(app) -> "1"))
        catch { case e: Throwable => errs.add(e) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"merge threads failed: $errs")
    // whichever merge lost the race retried — BOTH rows and BOTH
    // watermarks are resolvable afterwards (the loser's watermark
    // committed atomically with its retried merge)
    assert(VersionedTable.readLatest(spark, root).count() == 3)
    assert(VersionedTable.txnVersion(root, "A") == Some(1L))
    assert(VersionedTable.txnVersion(root, "B") == Some(1L))
  }
}
