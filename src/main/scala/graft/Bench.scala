package graft
import org.apache.spark.sql.SparkSession

/** Headline bench: one JSON line with per-query steady-state seconds.
  *
  * Measurement discipline: this JVM runs ~60 codegen'd queries back to
  * back; cold timings conflate single-threaded Janino/JIT compilation of
  * each query's generated code with actual execution (observed 10-100×
  * inflation on a RANDOM query per run — NOTES.md). Each query is
  * therefore warmed twice on sf0.01 before timing: Spark's codegen cache
  * keys on the generated source, which is identical across SFs, so the
  * warm pass compiles the exact code the timed run executes while
  * touching ~10% of the data. Two runs at sf0.01 (60K+ rows) — not one at
  * sf0.001 (6K rows) — because HotSpot's C2 tier compiles generated loops
  * only after ~15K backedges; a 6K-row warm leaves the loop in C1 and the
  * first timed runs pay JIT (measured on q_mart_velocity: sf0.001 warm →
  * 2.89/1.64/1.43/1.22/1.12s decay; 2× sf0.01 warm → 1.54/1.09/1.10s —
  * the r3 "4× regression" was exactly this decay sampled at runs 1-2). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // warm the session machinery (codegen, shuffle service, parquet reader)
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Queries that threw during a timed run: name → error. A failed query
    // fail-fasts in ~0.05s, which silently DEFLATES the total (r6: 12 broken
    // queries "improved" the bench); surface them loudly instead so a red
    // registry can't masquerade as a perf win.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // A failed run's ~0.05s fail-fast duration must NOT count as a timing
    // observation: one transient failure + one 5s success would report
    // min=0.05s — a phantom speedup that also ducks the >3s retry pass.
    // Successful durations only; a query with NO successful run keeps its
    // fail-fast durations (so totals stay finite) and is flagged in
    // `errors`, which is the loud signal either way.
    val goodRuns = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    def timedRuns(name: String,
                  fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                  runs: Int): Seq[Double] = {
      val obs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            false
          }
        val d = (System.nanoTime() - t0) / 1e9
        // release per-query cached tables (persist() registrations) so heap
        // pressure from earlier queries can't distort later timings
        spark.catalog.clearCache()
        if (ok) goodRuns(name) += 1
        (d, ok)
      }
      val good = obs.collect { case (d, true) => d }
      if (good.nonEmpty) good else obs.map(_._1)
    }
    // two timed runs, report the min: this host has hypervisor-steal
    // windows (accumulated steal visible in /proc/stat) that inject
    // multi-second stalls onto whatever runs during them; the min of
    // full-execution runs is the steady-state number a cluster would see.
    // SPARK_GRAFT_ONLY=q1,q2 — local iteration filter (targeted
    // re-times in a clean window); the driver always runs the full board
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    var results = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq.sortBy(_._1).map { case (name, fn) =>
      for (_ <- 1 to 2) { // 2×: first compiles codegen, second crosses C2 JIT thresholds
        try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      // persisted-index probes are sub-second steady state but their
      // FIRST sf0.1 run pays the index build: with only 2 timed runs a
      // steal window on run 2 leaves med/min unbounded (r8:
      // q_ann_ivfpq_persisted med/min 3.85) — a third run pins the
      // steady state. q_ann_ivf_kmpp re-trains kmeans‖ every run (the
      // deliberate full-composition timing) — the same 2-run spread
      // hazard (r11: med/min 1.98 from one swept run), same remedy.
      name -> timedRuns(name, fn,
        if (name.endsWith("_persisted") || name == "q_ann_ivf_kmpp") 3 else 2)
    }
    // retry pass: a steal window lasts tens of seconds and sweeps the
    // queries that happen to execute inside it (both min-of-2 runs). By
    // the end of the sweep the window has usually passed — re-time any
    // query that still looks stalled. ALL observations are kept: the
    // reported value is the min (steady state), but min/median/run-count
    // per query go to bench_detail.json so a genuine regression is
    // distinguishable from steal-window mitigation (a real slowdown shows
    // in the median even when retries rescue the min).
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    // prior round's committed per-query minima (bench_detail.json in the
    // repo root, read BEFORE this run overwrites it): the RELATIVE
    // re-time reference. Sub-3s queries swept by a steal window used to
    // surface as unconfirmable "regressions" every round (r13:
    // q_hll_est 0.19→2.40 min with runs=2, never re-timed because the
    // old threshold was absolute min>3.0s) — any query whose fresh min
    // exceeds 1.5× its prior committed min now re-times in the same
    // sweep, so a genuine regression shows with runs ≥ 4 and a swept
    // window self-corrects.
    val priorMin: Map[String, Double] =
      (try {
        val p = java.nio.file.Paths.get("bench_detail.json")
        if (!java.nio.file.Files.exists(p)) Map.empty[String, Double]
        else {
          val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          """"([^"]+)":\{"min":([0-9.]+)""".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty[String, Double] })
    // re-time on absolute stall (min > 3s), on med/min spread > 1.5 at
    // ≥0.5s (a steal window that inflates only SOME runs shows as
    // spread), or on min > 1.5× the prior round's committed min at
    // ≥0.25s (the relative trigger above — the floor keeps ±50ms jitter
    // on sub-quarter-second queries from burning retry passes).
    def needsRetime(name: String, obs: Seq[Double]): Boolean =
      obs.min > 3.0 || (obs.min >= 0.5 && median(obs) > 1.5 * obs.min) ||
        (obs.min >= 0.25 && priorMin.get(name).exists(p => obs.min > 1.5 * p))
    for (_ <- 1 to 2 if results.exists(r => needsRetime(r._1, r._2))) {
      results = results.map { case (name, obs) =>
        if (needsRetime(name, obs)) name -> (obs ++ timedRuns(name, SparkEntry.queries(name), 2))
        else name -> obs
      }
    }
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // stdout contract: ONE json line that must fit the driver's
    // ~2000-char output-tail window. Query NAMES dominate the line (89
    // queries at 1 decimal still measured ~1880 chars), so decimals can't
    // save it as the registry grows. Instead the per-query map lists only
    // queries at ≥0.25s steady state (the ones whose regressions matter);
    // the sub-0.25s tail is summarized as fast_n/fast_total. The committed
    // bench_detail.json keeps full 3-decimal min/med/runs for EVERY query
    // — that's the file to diff for precise round-over-round comparisons.
    def f2(v: Double): String = {
      val s = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
    }
    // the stdout line must fit the driver's ~2000-char output tail at
    // ANY registry size and on a slow machine day (a noisy host pushes
    // more queries over any fixed threshold — a 140-query registry
    // measured 2221 chars under the old >=0.25s rule, which would cut
    // the line's head and break the driver's JSON parse). So the listed
    // map is BUDGET-capped: slowest first until ~1600 chars of entries,
    // the rest summarized in fast_n/fast_total. bench_detail.json keeps
    // full 3-decimal coverage and is the round-over-round contract.
    // A query with NO successful run keeps only ~0.05s fail-fast
    // durations; including those in total_min would let a red registry
    // DEFLATE the headline number (r6 failure mode). All-failed queries
    // are excluded from the total and every stdout aggregate, counted in
    // "failed_n", and flagged per-entry in bench_detail.json.
    val failed = results.collect { case (k, _) if goodRuns(k) == 0 => k }.toSet
    val timedResults = results.filterNot { case (k, _) => failed(k) }
    val budget = 1600
    val bySlowest = timedResults.sortBy { case (k, obs) => (-obs.min, k) }
    val listed = scala.collection.mutable.ListBuffer.empty[(String, Seq[Double])]
    var used = 0
    for ((k, obs) <- bySlowest) {
      val entLen = k.length + f2(obs.min).length + 4
      if (used + entLen <= budget && obs.min >= 0.25) {
        listed += ((k, obs)); used += entLen
      }
    }
    val listedKeys = listed.map(_._1).toSet
    val fast = timedResults.filterNot { case (k, _) => listedKeys(k) }
    val qs = listed.sortBy(_._1)
      .map { case (k, obs) => s"\"" + k + "\":" + f2(obs.min) }
      .mkString("{", ",", "}")
    val fastN = fast.length
    val fastTotal = fast.map(_._2.min).sum
    val total = timedResults.map(_._2.min).sum
    val detail = results.map { case (k, obs) =>
      val failFlag = if (failed(k)) ""","failed":true""" else ""
      s"""\"$k\":{"min":${f3(obs.min)},"med":${f3(median(obs))},"runs":${obs.length}$failFlag}"""
    }.mkString("{", ",", "}")
    def jesc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val errJson = errors.map { case (k, v) => s""""${jesc(k)}":"${jesc(v)}"""" }
      .mkString("{", ",", "}")
    val detailPath = java.nio.file.Paths.get("bench_detail.json")
    java.nio.file.Files.write(detailPath,
      s"""{"sf":"$sfDir","total_min":${f3(total)},"errors":$errJson,"queries":$detail}\n""".getBytes("UTF-8"))
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","errors":${errors.size},"failed_n":${failed.size},"queries":$qs,"fast_n":$fastN,"fast_total":${f2(fastTotal)},"detail":"bench_detail.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
