package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Capstone composition: the full streaming-lakehouse loop wired ONLY
  * through the public DataSource surface —
  *
  *   source stream ──writeStream format(gvt)──▶ bronze versioned table
  *   bronze ──readStream format(gvt-cdf)──▶ per-commit changelog
  *   changelog ──foreachBatch additive merge──▶ gold aggregate table
  *
  * Every hop is checkpointed/replay-guarded, so the gold view must
  * converge EXACTLY to the batch rebuild of everything ingested —
  * across a mid-flight kill-and-restart of the whole downstream. */
class LakehouseE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream → gvt bronze → gvt-cdf → maintained gold == batch rebuild, restart-safe") {
    val dir = Files.createTempDirectory("graft_e2e").toString
    val bronze = s"$dir/bronze"
    val gold = s"$dir/gold"
    implicit val ctx = spark.sqlContext

    // ── ingestion leg: micro-batches land as versioned append commits
    val in = MemoryStream[(Int, String, Long)]
    val ingest = in.toDF().select(col("_1").as("k"), col("_2").as("grp"),
      col("_3").as("cents"))
      .writeStream.format("gvt").option("path", bronze)
      .option("checkpointLocation", s"$dir/ckpt_ingest").start()

    // ── maintenance leg: the change feed drives an additive gold merge
    def startMaint() = spark.readStream.format("gvt-cdf")
      .option("keys", "k").load(bronze)
      .writeStream.option("checkpointLocation", s"$dir/ckpt_maint")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.streaming.EventsStream.applyAggDelta(gold,
          batch.select(col("grp"),
            graft.streaming.ChangeFeed.changeOp.as("op"),
            col("cents").cast("long").as("measure")), id)
      }.start()

    def rebuild(): Map[String, (Long, Long)] =
      VersionedTable.readLatest(spark, bronze)
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    def goldRows(): Map[String, (Long, Long)] =
      VersionedTable.readLatest(spark, gold)
        .select(col("grp"), col("n"), col("sum_measure"))
        .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    try {
      // first batch creates the bronze table (the CDF source reads its
      // schema from the live snapshot, so it attaches afterwards)
      in.addData((1, "a", 10L), (2, "b", 20L), (3, "a", 30L))
      ingest.processAllAvailable()
      val maint1 = startMaint()
      try {
        maint1.processAllAvailable()
        in.addData((4, "b", 40L), (5, "c", 50L))
        ingest.processAllAvailable(); maint1.processAllAvailable()
        assert(goldRows() == rebuild() && goldRows().nonEmpty)
      } finally maint1.stop() // KILL the maintenance leg mid-pipeline
      // ingestion keeps landing commits while the downstream is dead
      in.addData((6, "a", 60L), (7, "c", 70L))
      ingest.processAllAvailable()
      assert(goldRows() != rebuild()) // gold is genuinely behind now
      // restart the maintenance leg from its checkpoint: it must catch
      // up EXACTLY once (no double-counted groups, no gaps)
      val maint2 = startMaint()
      try {
        maint2.processAllAvailable()
        assert(goldRows() == rebuild())
        // and keep following while both legs run
        in.addData((8, "b", 80L))
        ingest.processAllAvailable(); maint2.processAllAvailable()
        assert(goldRows() == rebuild())
      } finally maint2.stop()
    } finally ingest.stop()

    // the bronze chain is an O(batch) append chain, foldable without
    // disturbing the (already-converged) downstream state
    val ops = VersionedTable.history(spark, bronze)
      .select("operation").as[String].collect().toSeq
    assert(ops.count(_ == "APPEND") >= 3, s"ingestion must append, got $ops")
    VersionedTable.compactChain(spark, bronze)
    assert(goldRows() == rebuild())
  }
}
