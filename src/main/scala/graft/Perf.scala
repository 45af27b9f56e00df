package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling: warm-session per-query timings (2 runs, report 2nd) and
  * formatted plans for the slowest queries. */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.sources.LocalFsInstall.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val timings = names.map { name =>
      val fn = SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = run(); val warm = run()
      println(f"PERF $name%-24s cold=$cold%7.2f warm=$warm%7.2f")
      name -> warm
    }
    val worst = timings.sortBy(-_._2).take(3)
    println("WORST: " + worst.map { case (n, t) => f"$n=$t%.2f" }.mkString(", "))
    worst.foreach { case (n, _) =>
      println(s"\n===== EXPLAIN $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
