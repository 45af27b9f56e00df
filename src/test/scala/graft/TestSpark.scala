package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM. */
object TestSpark {

  /** The executedPlan string embeds each InMemoryRelation's one-time
    * build plan (whose REPARTITION/broadcast exchanges are paid once at
    * prepare, not per round); keep only live plan lines so per-round
    * assertions do not trip on build-time nodes. A subtree is dropped by
    * indentation: lines strictly deeper than their InMemoryRelation. */
  def livePlan(plan: String): String = {
    def depth(l: String): Int = {
      val i = l.indexOf("+-"); val j = l.indexOf(":-")
      if (i < 0) j else if (j < 0) i else math.min(i, j)
    }
    var skipBelow = -1
    plan.linesIterator.filter { l =>
      val d = depth(l)
      if (skipBelow >= 0 && (d > skipBelow || d < 0)) false
      else if (l.contains("InMemoryRelation")) { skipBelow = d; false }
      else { skipBelow = -1; true }
    }.mkString("\n")
  }

  /** True when any of `df`'s input files lives UNDER `root` (path
    * boundary — a bare basename `contains` can match sibling dirs that
    * share the name as a path fragment). */
  def scansUnder(df: org.apache.spark.sql.DataFrame, root: String): Boolean = {
    val canon = new java.io.File(root).getCanonicalPath
    df.inputFiles.exists { f =>
      val p = try new java.net.URI(f).getPath catch { case _: Exception => f }
      p != null && (p == canon || p.startsWith(canon + "/"))
    }
  }

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
