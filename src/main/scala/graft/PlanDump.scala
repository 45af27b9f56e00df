package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    graft.sources.LocalFsInstall.install(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_scan_table","q_mart_dept","q_fct_orders","q_dim_users","q_mart_velocity","q_topk_per_key")
    for (n <- names) {
      println(s"===== $n =====")
      if (sideEffecting.contains(n)) sideEffecting(n)(spark)
      else if (extras.contains(n)) extras(n)(spark).explain("formatted")
      else SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }

  /** Internal-operator plan demos (dev evidence): operators whose
    * interesting plan lives INSIDE a fixture query's eager pipeline and
    * never surfaces in the declared frame's explain. */
  private val extras: Map[String, SparkSession => org.apache.spark.sql.DataFrame] = Map(
    // the accepted-rows pipeline of IncrementalDedup.ingest, on a
    // synthetic 3-row batch + 2-row index (the real shapes, tiny data)
    "x_incdedup_accepted" -> { spark =>
      import spark.implicits._
      val sigs = Seq((1L, "a", "b"), (2L, "c", "d"), (3L, "a", "e"))
        .toDF("doc_id", "band0", "band1").localCheckpoint()
      val bb = graft.llm.IncrementalDedup
        .meltBands(sigs, Seq("band0", "band1")).localCheckpoint()
      val index = Seq((0, "zz"), (1, "d")).toDF("band_id", "band")
      val dropped = graft.llm.IncrementalDedup.intraBucketHits(bb)
        .union(graft.llm.IncrementalDedup.crossProbe(index, bb, 1L, 64L << 20))
      sigs.join(dropped, Seq("doc_id"), "left_anti")
    }
  )

  /** Plan captures that need a real pipeline run: a QueryExecutionListener
    * prints the EXECUTED plan of the interesting internal action. */
  private val sideEffecting: Map[String, SparkSession => Unit] = Map(
    // the MV_REFRESH fold write of a sum/count join view across a mixed
    // (delete + append) range — the diffDeltaAgg retraction shape
    "x_mv_retract_refresh_plan" -> { spark =>
      import org.apache.spark.sql.functions._
      import graft.sources.{MaterializedView, VersionedTable}
      val base = java.nio.file.Files.createTempDirectory("graft_pd_mv").toString
      val oRoot = s"$base/o"; val cRoot = s"$base/c"; val mv = s"$base/mv"
      VersionedTable.write(spark.range(100).select(col("id").as("k"),
        (col("id") % 5).as("ck"), (col("id") * 3 + 1).as("cents")), oRoot)
      VersionedTable.setTblProperties(oRoot,
        Map("gvt.enableChangeDataFeed" -> "true"))
      VersionedTable.write(spark.range(5).select(col("id").as("ck2"),
        concat(lit("S"), col("id")).as("segment")), cRoot)
      graft.GraftSession.withExtensions(spark) { sess =>
        sess.read.format("gvt").load(oRoot).createOrReplaceTempView("pd_o")
        sess.read.format("gvt").load(cRoot).createOrReplaceTempView("pd_c")
        MaterializedView.createExact(sess, mv,
          "SELECT segment, sum(cents) AS s, count(*) AS n " +
            "FROM pd_o JOIN pd_c ON ck = ck2 GROUP BY segment")
        VersionedTable.deleteWhereVector(sess, oRoot, col("k") % 7 === 0)
        VersionedTable.append(sess.range(5).select((col("id") + 900).as("k"),
          (col("id") % 5).as("ck"), lit(42L).as("cents")), oRoot)
        val plans = new java.util.concurrent.CopyOnWriteArrayList[String]()
        val l = new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            plans.add(s"== action: $funcName ==\n" + qe.executedPlan.toString())
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        }
        sess.listenerManager.register(l)
        try {
          MaterializedView.refresh(sess, mv)
          org.apache.spark.sql.graft.NativeColumns.drainListenerBus(sess)
        } finally sess.listenerManager.unregister(l)
        // the fold write is the LARGEST captured write plan (the others
        // are the side/metric writes)
        import scala.jdk.CollectionConverters._
        println(plans.asScala.toSeq.sortBy(-_.length).headOption
          .getOrElse("NO WRITE PLAN CAPTURED"))
        MaterializedView.drop(mv)
      }
    }
  )
}
