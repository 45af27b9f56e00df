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
      if (extras.contains(n)) extras(n)(spark).explain("formatted")
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
}
