package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiling harness (not part of the driver contract): runs named
  * registry queries with a job listener and prints, per query, the wall
  * time split into Spark-job time (attributed to the submitting
  * callsite) and the driver-side gap (planning, filesystem metadata,
  * commit-marker IO). Guide §1: measure first — this is how fixture
  * queries' multi-commit overhead is located before touching anything.
  */
object ProfileQ {
  private case class JobRec(jobId: Int, start: Long, var end: Long = -1L,
                            site: String)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = {
      val d = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.01")
      if (new java.io.File(d).isDirectory) d else sfDir
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.sources.LocalFsInstall.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    // executionId -> the ACTION callsite, so AQE stage/broadcast jobs
    // (whose own callsite is the generic materialization future)
    // attribute to the query action that spawned them
    val execSite = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val listener = new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execSite.put(s.executionId, s.description.linesIterator.nextOption().getOrElse("?"))
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val stageSite = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execSite.get(id.toLong)))
          .map(d => s"$d [stage: ${stageSite.takeWhile(_ != '(').trim}]")
          .getOrElse(stageSite)
        jobs.put(js.jobId, JobRec(js.jobId, js.time, site = site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = if (args.nonEmpty) args.toSeq else Seq("q_sql_delete_corr")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      for (_ <- 1 to 2) {
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      // settle listener events from the warm runs, then reset
      Thread.sleep(400)
      jobs.clear()
      graft.sources.VersionedTable.metaReadNames.clear()
      val mr0 = graft.sources.VersionedTable.metaReads.get()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(400)
      val mr1 = graft.sources.VersionedTable.metaReads.get()
      spark.catalog.clearCache()

      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.filter(_.end > 0).sortBy(_.start)
      val jobMs = recs.map(r => r.end - r.start).sum
      println(f"\nPROFILE $name wall=${wallMs / 1000}%.2fs jobs=${recs.size} " +
        f"jobTime=${jobMs / 1000.0}%.2fs driverGap=${(wallMs - jobMs) / 1000}%.2fs " +
        s"metaReads=${mr1 - mr0}")
      if (sys.env.contains("SPARK_GRAFT_META_DEBUG")) {
        val byName = graft.sources.VersionedTable.metaReadNames.asScala
          .map { case (k, v) => k -> v.getAndSet(0L) }
          .filter(_._2 > 0).toSeq.sortBy(-_._2)
        println("  metaReads by name: " + byName.take(14)
          .map { case (k, v) => s"$k=$v" }.mkString(" "))
      }
      val bySite = recs.groupBy(_.site).map { case (s, rs) =>
        (s, rs.size, rs.map(r => r.end - r.start).sum)
      }.toSeq.sortBy(-_._3)
      bySite.take(30).foreach { case (s, n, ms) =>
        println(f"  ${ms / 1000.0}%7.2fs n=$n%-4d $s")
      }
      // timeline of the 25 longest gaps between consecutive jobs
      if (recs.size > 1) {
        val gaps = recs.sliding(2).collect { case Seq(a, b) =>
          (b.start - a.end, a.site, b.site)
        }.toSeq.sortBy(-_._1).take(15).filter(_._1 > 20)
        if (gaps.nonEmpty) println("  -- inter-job driver gaps >20ms --")
        gaps.foreach { case (ms, a, b) =>
          println(f"  gap ${ms / 1000.0}%6.2fs after [$a] before [$b]")
        }
      }
    }
    spark.stop()
  }
}
