package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Scale-shape stress harness (the "would it survive 100×" evidence
  * the per-operator plan audits argue by shape): drives the full
  * versioned-table lifecycle — partitioned write, streaming-style
  * appends, DV DELETE/UPDATE, snapshot + time-travel reads, small-file
  * OPTIMIZE, file-granular VACUUM — plus an incremental-dedup batch,
  * at two scales (sf0.1 inputs ×1 and ×N via key-offset replication,
  * default N=10 ≈ sf1), and prints per-stage seconds as one JSON line
  * per scale. A stage whose wall grows faster than the data (ratio ≫ N)
  * is a scaling bug; ratios ≲ N confirm the O(batch)/O(changed)
  * claims. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.StressRun [N]"
  */
object StressRun {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.sources.LocalFsInstall.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()
    for (scale <- Seq(1, mult)) run(spark, sfDir, scale)
    spark.stop()
  }

  /** `orders` at `scale`× the base SF: replicas shift every key by
    * r * 10^9 so the scaled table keeps per-key uniqueness (the shape
    * a larger SF would have), never duplicate-key inflation. */
  private def scaled(spark: SparkSession, sfDir: String, table: String,
                     key: String, scale: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/$table.parquet")
    (0 until scale).map(r =>
      base.withColumn(key, col(key) + lit(r.toLong * 1000000000L)))
      .reduce(_ union _)
  }

  private def run(spark: SparkSession, sfDir: String, scale: Int): Unit = {
    val out = java.nio.file.Files.createTempDirectory(
      s"graft_stress_x$scale").toString
    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def stage[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      stages(name) = (System.nanoTime() - t0) / 1e9
      r
    }
    val o = scaled(spark, sfDir, "orders", "o_orderkey", scale)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .localCheckpoint()
    val nRows = o.count()
    val root = s"$out/t"
    // lifecycle: the medallion write/maintain/read cycle at scale
    stage("write_partitioned") {
      VersionedTable.write(o.filter(col("k") % 4 =!= 0), root,
        partitionBy = Seq("status"), statsCols = Seq("k"))
    }
    stage("append_x3") {
      for (m <- 1 to 3)
        VersionedTable.append(o.filter(col("k") % 4 === 0 &&
          col("k") % 3 === (m % 3)), root, statsCols = Seq("k"))
    }
    stage("delete_dv") {
      VersionedTable.deleteWhereVector(spark, root, col("k") % 13 === 0)
    }
    stage("update_dv") {
      VersionedTable.updateWhereVector(spark, root,
        col("k") % 17 === 0, Map("cents" -> (col("cents") + 1L)))
    }
    val agg1 = stage("read_agg") {
      VersionedTable.readLatest(spark, root)
        .groupBy("status").agg(count(lit(1)), sum("cents")).collect().length
    }
    stage("time_travel_agg") {
      VersionedTable.readVersion(spark, root, 1).count()
    }
    stage("optimize_small") {
      VersionedTable.compactSmall(spark, root,
        smallFileBytes = 8L * 1024 * 1024)
    }
    stage("vacuum_purge") {
      VersionedTable.vacuum(root, keep = 1, retainMinMs = 0L)
    }
    val agg2 = stage("read_after_maintenance") {
      VersionedTable.readLatest(spark, root)
        .groupBy("status").agg(count(lit(1)), sum("cents")).collect().length
    }
    require(agg1 == agg2, s"status groups changed: $agg1 vs $agg2")
    // materialized-view maintenance at scale: creation pays the base
    // aggregate ONCE; each refresh must then track the DELTA, not the
    // base — the ratio between mv_refresh at ×1 and ×N is the claim
    // under test (≈1 expected; ≈N would mean the fold re-reads the base)
    import graft.sources.MaterializedView
    import graft.sources.MaterializedView.AggSpec
    val mvRoot = s"$out/mv"
    stage("mv_create") {
      MaterializedView.create(spark, root, mvRoot, Seq("status"),
        Seq(AggSpec("sum", "cents", "sum_cents"), AggSpec("count", "*", "n")))
    }
    val delta1 = o.filter(col("k") % 991 === 0).limit(10000).localCheckpoint()
    stage("mv_refresh_incremental") { // fixed ~10k-row delta at ANY scale
      VersionedTable.append(delta1, root, statsCols = Seq("k"))
      MaterializedView.refresh(spark, mvRoot)
    }
    // differential JOIN view: fact(root) ⋈ fixed dim, expression join
    // key; refresh after a fixed-size fact delta must also stay flat
    val cRoot = s"$out/dim"; val mvjRoot = s"$out/mvj"
    VersionedTable.write(spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("ck2"), col("c_mktsegment").as("segment")),
      cRoot)
    spark.read.format("gvt").load(root).createOrReplaceTempView("stress_o")
    spark.read.format("gvt").load(cRoot).createOrReplaceTempView("stress_c")
    stage("mv_join_create") {
      MaterializedView.createExact(spark, mvjRoot,
        "SELECT segment, sum(cents) AS s, count(*) AS n " +
          "FROM stress_o JOIN stress_c ON k % 15000 = ck2 GROUP BY segment")
    }
    val delta2 = o.filter(col("k") % 993 === 0).limit(10000)
      .withColumn("k", col("k") + lit(1000000000000L)).localCheckpoint()
    stage("mv_join_refresh_diff") {
      VersionedTable.append(delta2, root, statsCols = Seq("k"))
      MaterializedView.refresh(spark, mvjRoot)
    }
    // counting-IVM retraction through the join view: delete exactly
    // the 10k delta rows (zone maps prune the locate scan to their
    // file) and refresh — the signed fold must stay flat across
    // scales, like the insert fold above (a ratio ≈ N would mean the
    // retraction re-read the fact)
    stage("mv_join_refresh_retract") {
      VersionedTable.deleteWhereVector(spark, root,
        col("k") >= 1000000000000L)
      MaterializedView.refresh(spark, mvjRoot)
    }
    require(MaterializedView.exactViews.exists(e =>
      e.spec.mvRoot == mvjRoot && e.joinAgg.isDefined),
      "join view must carry the differential shape")
    require(!VersionedTable.history(spark, mvjRoot)
      .select("operation").collect().map(_.getString(0))
      .contains("MV_REBUILD"),
      "join-view maintenance must stay differential (insert AND retract)")
    MaterializedView.drop(mvRoot); MaterializedView.drop(mvjRoot)
    // min/max retraction via AFFECTED-GROUP recompute: a base keyed
    // into ~10k-key groups (g-clustered files, zone maps on g), a
    // min/max view over g, and a delete confined to ONE group — the
    // recompute must re-read only that group's file neighborhood, so
    // the stage stays flat across scales (a ratio ≈ N would mean the
    // retraction re-aggregated the whole base, the pre-r16 behavior)
    val mvmBase = s"$out/mvmb"; val mvmRoot = s"$out/mvm"
    VersionedTable.write(o.withColumn("g", (col("k") / 10000L)),
      mvmBase, statsCols = Seq("g", "k"))
    stage("mv_minmax_create") {
      MaterializedView.create(spark, mvmBase, mvmRoot, Seq("g"),
        Seq(AggSpec("min", "cents", "mn"), AggSpec("max", "cents", "mx"),
          AggSpec("count", "*", "n")))
    }
    stage("mv_minmax_refresh_retract") { // fixed one-group delete at ANY scale
      VersionedTable.deleteWhereVector(spark, mvmBase,
        col("g") === 3L && col("cents") % 2 === 0)
      MaterializedView.refresh(spark, mvmRoot)
    }
    require(!VersionedTable.history(spark, mvmRoot)
      .select("operation").collect().map(_.getString(0))
      .contains("MV_REBUILD"),
      "min/max retraction must take the affected-group recompute")
    MaterializedView.drop(mvmRoot)
    // incremental dedup: build the persisted index over the FULL
    // ×scale corpus (timed — expected to scale with the data), then
    // ingest a FIXED ~10k-doc batch against it. The batch stage is the
    // O(batch) claim under test: flat across scales (the old version
    // fed the whole corpus as "the batch", so ×100 measured throughput,
    // not the claim).
    val docs = (0 until scale).map { r =>
      spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("doc_id", concat(lit(s"r$r/"), col("doc_id")))
    }.reduce(_ union _)
    def sigsOf(d: DataFrame): DataFrame = d.select(col("doc_id"),
      md5(col("text")).as("b0"),
      md5(reverse(col("text"))).as("b1"))
    stage("dedup_index_build") {
      graft.llm.IncrementalDedup.ingest(spark, s"$out/idx",
        sigsOf(docs), Seq("b0", "b1")).count()
    }
    val batch = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(10000).withColumn("doc_id", concat(lit("new/"), col("doc_id")))
      .localCheckpoint()
    stage("incremental_dedup") { // fixed ~10k-doc batch at ANY scale
      graft.llm.IncrementalDedup.ingest(spark, s"$out/idx",
        sigsOf(batch), Seq("b0", "b1")).count()
    }
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val js = stages.map { case (k, v) => s""""$k":${f3(v)}""" }
      .mkString("{", ",", "}")
    println(s"""STRESS {"scale":$scale,"rows":$nRows,"total":${f3(
      stages.values.sum)},"stages":$js}""")
  }
}
