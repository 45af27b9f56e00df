package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Generated-column partition pruning: filters on the BASE column of a
  * monotone generated partition column (`day = cast(ts AS date)`)
  * prune partition directories at planning — and non-monotone
  * registrations derive nothing (missed prune, never a wrong one). */
class GeneratedPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Files actually READ by the scan (post partition-pruning), from the
    * executed FileSourceScanExec's numFiles metric. */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, s"no file scan in:\n$plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  private def mkTable(expr: String): (String, DataFrame) = {
    val root = fresh("genprune")
    VersionedTable.addGeneratedColumn(spark, root, "day", expr)
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (3L, ts("2024-01-02 10:00:00")), (4L, ts("2024-01-03 10:00:00")),
      (5L, ts("2024-01-04 10:00:00")), (6L, ts("2024-01-04 23:00:00"))
    ).toDF("k", "event_ts")
    VersionedTable.write(rows, root, partitionBy = Seq("day"))
    (root, spark.read.format("gvt").load(root))
  }

  test("range and equality filters on the base column prune generated " +
    "date partitions; results stay exact") {
    val (_, t) = mkTable("cast(event_ts as date)")
    val all = scannedFiles(t.select("k"))
    assert(all >= 4, s"expected >= 4 partition files, got $all")
    // range: only 2024-01-03 and later partitions scan
    val ranged = t.filter(col("event_ts") >= lit(ts("2024-01-03 00:00:00")))
    assert(ranged.select("k").as[Long].collect().sorted.toSeq ==
      Seq(4L, 5L, 6L))
    val rangedFiles = scannedFiles(
      t.filter(col("event_ts") >= lit(ts("2024-01-03 00:00:00"))))
    assert(rangedFiles < all,
      s"range derivation did not prune: $rangedFiles/$all")
    // equality: exactly one day's partition
    val eqFiles = scannedFiles(
      t.filter(col("event_ts") === lit(ts("2024-01-02 10:00:00"))))
    assert(eqFiles < rangedFiles || eqFiles == 1,
      s"equality derivation did not prune: $eqFiles")
    assert(t.filter(col("event_ts") === lit(ts("2024-01-02 10:00:00")))
      .select("k").as[Long].collect().toSeq == Seq(3L))
    // strict upper bound
    val below = t.filter(col("event_ts") < lit(ts("2024-01-02 00:00:00")))
    assert(below.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(scannedFiles(
      t.filter(col("event_ts") < lit(ts("2024-01-02 00:00:00")))) < all)
  }

  test("date_trunc and year chains derive; month (non-monotone) " +
    "derives nothing") {
    val (_, t) = mkTable("cast(date_trunc('DAY', event_ts) as date)")
    val all = scannedFiles(t.select("k"))
    val pruned = scannedFiles(
      t.filter(col("event_ts") > lit(ts("2024-01-03 12:00:00"))))
    assert(pruned < all, s"date_trunc chain did not prune: $pruned/$all")

    // year(): coarse but monotone — a bound in another year prunes all
    val rootY = fresh("genpruney")
    VersionedTable.addGeneratedColumn(spark, rootY, "yr", "year(event_ts)")
    VersionedTable.write(
      Seq((1L, ts("2023-06-01 00:00:00")), (2L, ts("2024-06-01 00:00:00")))
        .toDF("k", "event_ts"),
      rootY, partitionBy = Seq("yr"))
    val ty = spark.read.format("gvt").load(rootY)
    val allY = scannedFiles(ty.select("k"))
    assert(scannedFiles(
      ty.filter(col("event_ts") >= lit(ts("2024-01-01 00:00:00")))) < allY)

    // month() is NOT monotone across years: no derivation, full scan,
    // results still exact
    val rootM = fresh("genprunem")
    VersionedTable.addGeneratedColumn(spark, rootM, "mo", "month(event_ts)")
    VersionedTable.write(
      Seq((1L, ts("2023-06-01 00:00:00")), (2L, ts("2024-03-01 00:00:00")))
        .toDF("k", "event_ts"),
      rootM, partitionBy = Seq("mo"))
    val tm = spark.read.format("gvt").load(rootM)
    val allM = scannedFiles(tm.select("k"))
    assert(scannedFiles(
      tm.filter(col("event_ts") >= lit(ts("2024-01-01 00:00:00")))) == allM,
      "month() must not derive a partition bound")
    assert(tm.filter(col("event_ts") >= lit(ts("2024-01-01 00:00:00")))
      .select("k").as[Long].collect().toSeq == Seq(2L))
  }

  test("IN lists derive; NULL base rows live in the null partition and " +
    "never break results") {
    val root = fresh("genprunenull")
    VersionedTable.addGeneratedColumn(spark, root, "day",
      "cast(event_ts as date)")
    VersionedTable.write(
      Seq((1L, Some(ts("2024-01-01 10:00:00"))),
        (2L, Some(ts("2024-01-02 10:00:00"))),
        (3L, None), (4L, Some(ts("2024-01-03 10:00:00"))))
        .toDF("k", "event_ts"),
      root, partitionBy = Seq("day"))
    val t = spark.read.format("gvt").load(root)
    val all = scannedFiles(t.select("k"))
    val in = t.filter(col("event_ts").isin(
      ts("2024-01-01 10:00:00"), ts("2024-01-03 10:00:00")))
    assert(in.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(scannedFiles(t.filter(col("event_ts").isin(
      ts("2024-01-01 10:00:00"), ts("2024-01-03 10:00:00")))) < all)
    // the null-day row is reachable (the escape keeps its partition)
    assert(t.filter(col("event_ts").isNull).select("k").as[Long]
      .collect().toSeq == Seq(3L))
  }

  test("timezone soundness: a tz-dependent chain derives only under the " +
    "REGISTERED session zone, and writes under another zone refuse") {
    // registered + written under UTC (the suite's pinned session zone)
    val (root, t) = mkTable("cast(event_ts as date)")
    val all = scannedFiles(t.select("k"))
    val bound = lit(ts("2024-01-03 00:00:00"))
    assert(scannedFiles(t.filter(col("event_ts") >= bound)) < all,
      "derivation should prune under the registered zone")
    val key = "spark.sql.session.timeZone"
    spark.conf.set(key, "Australia/Sydney")
    try {
      // reader in a different zone: the cast's day mapping SHIFTS, so a
      // derived bound could prune a directory holding matching rows —
      // derivation must disable (scan everything), results stay exact
      // (the filter compares instants, tz-independent)
      val t2 = spark.read.format("gvt").load(root)
      assert(t2.filter(col("event_ts") >= bound)
        .select("k").as[Long].collect().sorted.toSeq == Seq(4L, 5L, 6L))
      assert(scannedFiles(spark.read.format("gvt").load(root)
        .filter(col("event_ts") >= bound)) == all,
        "tz-mismatched session must not use derived partition bounds")
      // writer in a different zone: values it computes follow ITS zone
      // and would corrupt the one-zone mapping pruning rests on — refuse
      val e = intercept[UnsupportedOperationException] {
        VersionedTable.append(
          Seq((7L, ts("2024-01-05 10:00:00"))).toDF("k", "event_ts"), root)
      }
      assert(e.getMessage.contains("timezone"))
    } finally spark.conf.set(key, "UTC")
    // back under the registered zone: writes and derivation resume
    VersionedTable.append(
      Seq((7L, ts("2024-01-05 10:00:00"))).toDF("k", "event_ts"), root)
    val t3 = spark.read.format("gvt").load(root)
    assert(t3.filter(col("event_ts") >= bound)
      .select("k").as[Long].collect().sorted.toSeq == Seq(4L, 5L, 6L, 7L))
  }
}
