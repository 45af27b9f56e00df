package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Small-file-only OPTIMIZE (Delta bin-packing semantics): only files
  * below the threshold are rewritten — one DV commit re-packs their
  * live rows, the originals elide from scans, well-packed files are
  * never touched, content is unchanged, the hop is CDF-neutral. */
class OptimizeSmallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  /** One well-packed base file + a ragged tail of small appends. */
  private def mk(root: String): Long = {
    VersionedTable.write(
      (1 to 20000).map(i => (i.toLong, s"payload_$i")).toDF("id", "s")
        .coalesce(1), root)
    (1 to 4).foreach { b =>
      VersionedTable.append(
        (20000 + b * 10 - 9 to 20000 + b * 10)
          .map(i => (i.toLong, s"payload_$i")).toDF("id", "s").coalesce(1),
        root)
    }
    // threshold: strictly between the tail files and the base file
    new java.io.File(s"$root/v=1").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".")).map(_.length).max
  }

  private def dataFiles(root: String): Seq[String] =
    VersionedTable.readLatest(spark, root).inputFiles.toSeq
      .filterNot(_.contains("/_dv"))

  test("only sub-threshold files are re-packed; the big file is untouched") {
    val root = fresh("optsm")
    val bigBytes = mk(root)
    val before = VersionedTable.readLatest(spark, root).count()
    val nv = VersionedTable.compactSmall(spark, root,
      smallFileBytes = bigBytes)
    assert(nv == 6L)
    assert(VersionedTable.readLatest(spark, root).count() == before)
    val fs = dataFiles(root)
    // the base file still serves — it was never rewritten
    assert(fs.exists(_.contains("/v=1/")),
      s"well-packed file must not be touched:\n${fs.mkString("\n")}")
    // the ragged tail elided: no v=2..v=5 file remains in the plan
    (2 to 5).foreach { b =>
      assert(!fs.exists(_.contains(s"/v=$b/")),
        s"small file of v=$b must be masked+elided:\n${fs.mkString("\n")}")
    }
    // one packed file carries the tail
    assert(fs.count(_.contains(s"/v=$nv/")) == 1)
    val op = VersionedTable.history(spark, root)
      .filter(col("version") === nv).select("operation").head.getString(0)
    assert(op.startsWith("OPTIMIZE_SMALL"))
  }

  test("DV-masked rows of a selected file stay deleted through the re-pack") {
    val root = fresh("optsmdv")
    val bigBytes = mk(root)
    VersionedTable.deleteWhereVector(spark, root, col("id") === 20005L)
    val nv = VersionedTable.compactSmall(spark, root,
      smallFileBytes = bigBytes)
    val live = VersionedTable.readLatest(spark, root)
    assert(live.count() == 20039)
    assert(live.filter(col("id") === 20005L).count() == 0)
    assert(nv == 7L)
  }

  test("fewer than two candidates is a no-op") {
    val root = fresh("optsm1")
    VersionedTable.write((1 to 100).toDF("id").coalesce(1), root)
    assert(VersionedTable.compactSmall(spark, root) == 1L)
  }

  test("the hop is CDF-neutral and the property routes plain OPTIMIZE") {
    val root = fresh("optsmp")
    val bigBytes = mk(root)
    VersionedTable.setTblProperties(root,
      Map("gvt.optimize.minFileBytes" -> bigBytes.toString))
    GraftSession.withExtensions(spark) { sess =>
      val nv = sess.sql(s"OPTIMIZE gvt.`$root`").head.getLong(0)
      assert(nv == 6L)
      val op = VersionedTable.history(sess, root)
        .filter(col("version") === nv).select("operation").head.getString(0)
      assert(op.startsWith("OPTIMIZE_SMALL"))
      assert(VersionedTable.changes(sess, root, nv - 1, nv).count() == 0)
      assert(VersionedTable.changes(sess, root, nv - 1, nv, Seq("id")).count() == 0)
    }
  }
}
