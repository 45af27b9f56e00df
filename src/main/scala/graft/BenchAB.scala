package graft

import java.net.{URL, URLClassLoader}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Paired A/B bench runner — the ambient-drift killer. The plain bench
  * compares this round's timings against LAST round's committed file,
  * so host-load drift between the two windows (±15% observed on
  * untouched queries, NOTES.md) muddies every sub-second delta. This
  * runner times BOTH jars inside ONE window, alternating per
  * repetition (A,B then B,A — ordering bias cancels), so each query's
  * paired delta subtracts the ambient noise the two sides share.
  *
  * Isolation: side A's `graft.*` / `org.apache.spark.sql.graft.*`
  * classes load CHILD-FIRST from the baseline jar; Spark, Scala, and
  * the JDK stay on the shared parent loader, so `SparkSession` /
  * `DataFrame` / `Function2` cross the boundary as the same classes
  * and the reflective `SparkEntry.queries` map is callable directly.
  * Side B is this JVM's own classpath (the candidate build). Each side
  * keeps its own object graph (registries, cached sibling sessions) —
  * queries are self-contained fixtures, so nothing else is shared.
  *
  * Usage (baseline = a prior round's jar, built from its commit):
  * {{{
  *   git worktree add /tmp/prior <commit> && (cd /tmp/prior && sbt package)
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BenchAB \
  *     /tmp/prior/target/scala-2.13/instacartmedallionlakehousespark_2.13-0.1.0.jar"
  * }}}
  *
  * Prints one `BENCH_AB {...}` JSON line (shared-query paired sums and
  * the per-query A/B minima and paired-delta medians) and writes the
  * full per-query detail to `bench_ab_detail.json`. Only queries
  * present in BOTH sides pair; each side warms at sf0.01 first (the
  * plain bench's codegen/JIT discipline).
  */
object BenchAB {

  /** Child-first loader for the engine's own packages; everything else
    * (Spark, Scala, JDK) resolves on the shared parent. */
  private final class SideLoader(jar: URL, parent: ClassLoader)
      extends URLClassLoader(Array(jar), parent) {
    private def isolated(name: String): Boolean =
      name.startsWith("graft.") ||
        name.startsWith("org.apache.spark.sql.graft.")
    override def loadClass(name: String, resolve: Boolean): Class[_] =
      getClassLoadingLock(name).synchronized {
        if (!isolated(name)) super.loadClass(name, resolve)
        else {
          var c = findLoadedClass(name)
          if (c == null)
            c = try findClass(name)
            catch { case _: ClassNotFoundException =>
              super.loadClass(name, resolve) }
          if (resolve) resolveClass(c)
          c
        }
      }
  }

  /** The `SparkEntry.queries` map of a side, reflectively. */
  private def queriesOf(loader: ClassLoader)
      : Map[String, (SparkSession, String) => DataFrame] = {
    val cls = loader.loadClass("graft.SparkEntry$")
    val module = cls.getField("MODULE$").get(null)
    cls.getMethod("queries").invoke(module)
      .asInstanceOf[Map[String, (SparkSession, String) => DataFrame]]
  }

  /** Run `f` with `cl` as the THREAD CONTEXT classloader: Spark
    * resolves `format("gvt")` / `USING gvt` through a ServiceLoader
    * scan of the context loader, so a side must plan under its OWN
    * loader — otherwise its rules pattern-match against the other
    * side's relation classes and every DML/MV/SQL-command query fails
    * (driver-side planning only; the side's classes, once loaded, run
    * fine in tasks). */
  private def withLoader[A](cl: ClassLoader)(f: => A): A = {
    val t = Thread.currentThread()
    val old = t.getContextClassLoader
    t.setContextClassLoader(cl)
    try f finally t.setContextClassLoader(old)
  }

  /** Execute the query inside its side's loader scope (count = the
    * bench action) and hand the frame back. */
  private def forced(df: DataFrame): DataFrame = { df.count(); df }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: BenchAB <baseline-jar> [rounds, default 2]")
    val jarA = new java.io.File(args(0))
    require(jarA.isFile, s"baseline jar not found: $jarA")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(2)
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
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()

    val loaderA: ClassLoader =
      new SideLoader(jarA.toURI.toURL, getClass.getClassLoader)
    val loaderB: ClassLoader = getClass.getClassLoader
    val sideA0 = queriesOf(loaderA)
    val sideB0 = SparkEntry.queries
    // bind each side's context loader around the ENTIRE query run
    // (construction AND execution — optimizer rules, codegen, and any
    // lazy source lookup all resolve classes during the action too)
    val sideA = sideA0.map { case (n, fn) =>
      n -> ((s: SparkSession, d: String) =>
        withLoader(loaderA)(forced(fn(s, d))))
    }
    val sideB = sideB0.map { case (n, fn) =>
      n -> ((s: SparkSession, d: String) =>
        withLoader(loaderB)(forced(fn(s, d))))
    }
    val shared = (sideA.keySet & sideB.keySet).toSeq.sorted
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = shared.filter(n => only.forall(_.contains(n)))
    System.err.println(s"[bench-ab] ${names.size} shared queries " +
      s"(A-only ${ (sideA.keySet -- sideB.keySet).size }, " +
      s"B-only ${ (sideB.keySet -- sideA.keySet).size }), $rounds rounds")

    def time(fn: (SparkSession, String) => DataFrame, dir: String)
        : Option[Double] = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, dir); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench-ab] FAILED: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(160))
          false
        }
      val d = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) Some(d) else None
    }

    // warm both sides back to back (codegen compiles once per distinct
    // generated source; 2× for the C2 JIT threshold — Bench.scala)
    for (n <- names; side <- Seq(sideA, sideB); _ <- 1 to 2)
      time(side(n), warmDir)

    val obsA = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val obsB = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val deltas = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    for (r <- 1 to rounds; n <- names) {
      // alternate within-pair order per round: A,B / B,A / …
      val (first, second, firstIsA) =
        if (r % 2 == 1) (sideA(n), sideB(n), true)
        else (sideB(n), sideA(n), false)
      (time(first, sfDir), time(second, sfDir)) match {
        case (Some(d1), Some(d2)) =>
          val (da, db) = if (firstIsA) (d1, d2) else (d2, d1)
          obsA(n) :+= da; obsB(n) :+= db; deltas(n) :+= db - da
        case _ => failed += n
      }
    }

    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val m = s.length
      if (m % 2 == 1) s(m / 2) else (s(m / 2 - 1) + s(m / 2)) / 2.0
    }
    val paired = names.filter(n => obsA(n).nonEmpty)
    val sumA = paired.map(n => obsA(n).min).sum
    val sumB = paired.map(n => obsB(n).min).sum
    val detail = paired.map { n =>
      s""""$n":{"a_min":${f3(obsA(n).min)},"b_min":${f3(obsB(n).min)},""" +
        s""""delta_med":${f3(median(deltas(n)))},"runs":${obsA(n).size}}"""
    }.mkString("{", ",", "}")
    val fails = failed.map(n => s""""$n"""").mkString("[", ",", "]")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_ab_detail.json"),
      (s"""{"baseline":"${jarA.getName}","sf_dir":"$sfDir",""" +
        s""""rounds":$rounds,"paired":${paired.size},""" +
        s""""a_min_sum":${f3(sumA)},"b_min_sum":${f3(sumB)},""" +
        s""""failed":$fails,"queries":$detail}""").getBytes("UTF-8"))
    println(s"""BENCH_AB {"paired":${paired.size},""" +
      s""""a_min_sum":${f3(sumA)},"b_min_sum":${f3(sumB)},""" +
      s""""b_over_a":${f3(if (sumA > 0) sumB / sumA else 0)},""" +
      s""""delta_med_sum":${f3(paired.map(n => median(deltas(n))).sum)},""" +
      s""""failed":${failed.size}}""")
    spark.stop()
  }
}
