package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalactic.Tolerance._
import graft.quality.{Gates, DataQualityError}

/** Port of the reference's pytest suite (tests/test_quality.py, 15 cases —
  * FIXTURES.md §A.2) plus Spark micro-fixtures for the gates the reference
  * leaves untested (§A.3). */
class GatesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- TestReconcileRowCounts (test_quality.py:24-52) ---
  test("recon: exact match passes with zero drift") {
    assert(Gates.reconcileRowCounts(1000, 1000, 0.001, "t") == 0.0)
  }
  test("recon: within threshold passes") {
    assert(Gates.reconcileRowCounts(1000, 999, 0.005, "t") === 0.001 +- 1e-9)
  }
  test("recon: drift beyond threshold fails") {
    intercept[DataQualityError](Gates.reconcileRowCounts(1000, 900, 0.01, "t"))
  }
  test("recon: row explosion fails") {
    intercept[DataQualityError](Gates.reconcileRowCounts(1000, 1200, 0.01, "t"))
  }
  test("recon: zero source no div-by-zero") {
    assert(Gates.reconcileRowCounts(0, 0, 0.0, "t") == 0.0)
  }
  test("recon: drift value returned") {
    assert(Gates.reconcileRowCounts(1000, 950, 0.10, "t") === 0.05 +- 1e-9)
  }

  // --- TestAssertRowCountNonzero (test_quality.py:57-71) ---
  test("nonzero: positive counts pass") {
    Gates.assertRowCountNonzero(100, "t")
    Gates.assertRowCountNonzero(1, "t")
    Gates.assertRowCountNonzero(33000000L, "t")
  }
  test("nonzero: zero raises") {
    intercept[DataQualityError](Gates.assertRowCountNonzero(0, "t"))
  }

  // --- TestDataQualityError (test_quality.py:76-84) ---
  test("DataQualityError is a RuntimeException with message") {
    val e = new DataQualityError("boom")
    assert(e.isInstanceOf[RuntimeException] && e.getMessage == "boom")
  }

  // --- TestPipelineGateSequence (test_quality.py:89-137, real Instacart counts) ---
  test("realistic clean pipeline: bronze==silver 3,421,083") {
    assert(Gates.reconcileRowCounts(3421083L, 3421083L, 0.001, "orders") == 0.0)
  }
  test("excessive row loss fails at real scale") {
    intercept[DataQualityError](
      Gates.reconcileRowCounts(3421083L, 3000000L, 0.01, "orders"))
  }
  test("minimal dedup loss passes: 33,819,106 -> 33,808,875") {
    val drift = Gates.reconcileRowCounts(33819106L, 33808875L, 0.001, "order_products")
    assert(drift < 0.001)
  }

  // --- Spark gates (untested in the reference — FIXTURES.md §A.3) ---
  test("null rate: 1 null in 10 rows = 0.1; gate passes/fails by threshold") {
    val df = (Seq.fill(9)(Some(1)) :+ None).toDF("v")
    assert(Gates.checkNullRate(df, "v", 0.2) === 0.1 +- 1e-12)
    intercept[DataQualityError](Gates.checkNullRate(df, "v", 0.05))
  }
  test("duplicate rate: key appearing 3x in 6 rows = 0.5") {
    val df = Seq(1, 1, 1, 2, 3, 4).toDF("k")
    assert(Gates.checkDuplicateRate(df, Seq("k"), 0.5) === 0.5 +- 1e-12)
    intercept[DataQualityError](Gates.checkDuplicateRate(df, Seq("k"), 0.4))
  }
  test("referential integrity: 2 orphans of 5 = 0.4; nulls not counted") {
    val child = Seq(Some(1), Some(2), Some(8), Some(9), Some(1), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    assert(Gates.checkReferentialIntegrity(child, "fk", parent, "pk",
      threshold = 0.5) === 0.4 +- 1e-12)
    intercept[DataQualityError](
      Gates.checkReferentialIntegrity(child, "fk", parent, "pk"))
  }
  test("profile: one scan yields count + per-column null rates") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None),
      (Some(4), Some("d"))).toDF("a", "b")
    val (n, rates) = Gates.profile(df, Seq("a", "b"))
    assert(n == 4 && rates("a") == 0.25 && rates("b") == 0.25)
  }
  test("empty input: rates are 0, not NaN") {
    val df = Seq.empty[Option[Int]].toDF("v")
    assert(Gates.checkNullRate(df, "v", 0.1) == 0.0)
    assert(Gates.checkDuplicateRate(df, Seq("v"), 0.0) == 0.0)
  }
}
