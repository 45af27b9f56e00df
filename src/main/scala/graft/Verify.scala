package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run on a small worker pool (default 4, env
  * SPARK_GRAFT_VERIFY_WORKERS) — Spark schedules concurrent jobs fine
  * and the registry's DDL-scenario queries are dominated by per-commit
  * fixed costs that parallelize perfectly, so the wall-time stays
  * bounded as the registry grows (r10: the driver's correctness
  * artifact came back EMPTY, most plausibly a wall-time cap — this
  * file is the hard gate and must never be the reason it's missing).
  * Ends with ONE machine-readable summary line
  * `{"dumped":N,"errors":M,"secs":S}` and a nonzero exit when any
  * query errored, so a broken run is loud instead of silently thin. */
object Verify {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query-name filter (local iteration;
    // the driver always invokes with 2 args = full dump)
    val only: Option[Set[String]] = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.sources.LocalFsInstall.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val work = new ConcurrentLinkedQueue[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach(work.add)
    val total = work.size
    val dumped = new AtomicInteger(0)
    val errors = new AtomicInteger(0)

    def runOne(name: String,
               fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      try {
        val df = fn(spark, sfDir)
        // The driver's compare hashes rows IN FILE ORDER, so a query's
        // top-level orderBy must survive into the single dumped file.
        // coalesce(1) preserves a global sort in the common plan, but
        // not under every optimizer/AQE interleaving (observed twice:
        // a correct row SET dumped unsorted under the parallel dump,
        // despite a re-asserted sortWithinPartitions — the optimizer
        // can prove that sort redundant against the child's ordering
        // claim and elide it, and the claim does not always hold). The
        // identity mapPartitions is an ENCODER BARRIER: it erases the
        // child's ordering knowledge, so the re-asserted sort can never
        // be eliminated and always executes inside the one coalesced
        // partition — unconditional file order at the cost of one
        // row-encode round trip of an already-small result.
        val one = df.coalesce(1)
        val out = df.queryExecution.analyzed match {
          case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global =>
            // the barrier renews exprIds, so the sort must re-resolve by
            // NAME — possible only when it references output columns
            // alone (every registry query today); otherwise keep the
            // in-lineage sort (best effort, the pre-barrier behavior)
            val names = df.schema.fieldNames.toSet
            if (s.order.forall(_.references.forall(a => names.contains(a.name))))
              one.mapPartitions(it => it)(
                org.apache.spark.sql.Encoders.row(df.schema))
                .sortWithinPartitions(s.order.map(_.transform {
                  case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
                    org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                      .quoted(a.name)
                }).map(org.apache.spark.sql.graft.NativeColumns.ofExpr): _*)
            else one.sortWithinPartitions(s.order.map(
              org.apache.spark.sql.graft.NativeColumns.ofExpr): _*)
          case _ => one
        }
        out.write.mode("overwrite").parquet(s"$outDir/$name")
        dumped.incrementAndGet()
      } catch { case e: Throwable =>
        errors.incrementAndGet()
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Leave a loud sentinel: an output dir with an _error file and no
        // parquet, so the driver's compare records a red row for this query
        // instead of silently dropping it from the correctness report
        // (r6: 12 broken queries vanished from the report unnoticed).
        val dir = Paths.get(outDir, name)
        try {
          if (Files.exists(dir)) { // clear any partial parquet output
            val walk = Files.walk(dir)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
            finally walk.close()
          }
          Files.createDirectories(dir)
          Files.writeString(dir.resolve("_error"),
            s"${e.getClass.getName}: ${e.getMessage}\n")
        } catch { case _: Throwable => () }
      }
      finally spark.catalog.clearCache() // release per-query persist() caches
    }

    val nWorkers = math.max(1, math.min(total,
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_WORKERS", "4").toInt))
    val threads = (1 to nWorkers).map { i =>
      val th = new Thread(() => {
        // thread-local active-session slot: fallback resolution inside
        // query code lands on the shared session, not a stale default
        SparkSession.setActiveSession(spark)
        var next = work.poll()
        while (next != null) {
          runOne(next._1, next._2)
          next = work.poll()
        }
      }, s"verify-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val secs = (System.nanoTime() - t0) / 1e9
    // the one line a human (or the driver's log scrape) needs
    println(f"""{"dumped":${dumped.get()},"errors":${errors.get()},"secs":$secs%.1f}""")
    spark.stop()
    if (errors.get() > 0) sys.exit(1)
  }
}
