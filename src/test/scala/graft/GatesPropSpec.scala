package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.quality.{Gates, DataQualityError}

/** Property tests for the gate math (SURVEY.md §5 plan: ScalaCheck over
  * the pure-scalar gates; the reference only has example-based tests).
  * Runs under sbt's native ScalaCheck framework alongside ScalaTest. */
object GatesPropSpec extends Properties("Gates") {
  private lazy val spark = TestSpark.spark

  // the Spark-backed properties run a small job per case — cap the count
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  property("recon drift = |t-s|/s and gates exactly at the threshold") =
    forAll(Gen.choose(1L, 1000000L), Gen.choose(0L, 2000000L)) { (s: Long, t: Long) =>
      val expected = math.abs(t - s).toDouble / s
      if (expected <= 0.5) Gates.reconcileRowCounts(s, t, 0.5, "t") == expected
      else
        try { Gates.reconcileRowCounts(s, t, 0.5, "t"); false }
        catch { case _: DataQualityError => true }
    }

  property("recon with zero source never divides by zero, always passes") =
    forAll(Gen.choose(0L, 100L)) { (t: Long) =>
      // reference semantics (quality.py:148-150): zero source -> drift 0
      Gates.reconcileRowCounts(0L, t, 0.0, "t") == 0.0
    }

  property("null rate equals exact fraction for arbitrary null placements") =
    Prop.forAllNoShrink(Gen.choose(0, 15), Gen.choose(1, 15)) { (nulls: Int, present: Int) =>
      import spark.implicits._
      val df = (Seq.fill(nulls)(Option.empty[Int]) ++ Seq.fill(present)(Some(1))).toDF("v")
      val expected = nulls.toDouble / (nulls + present)
      math.abs(Gates.checkNullRate(df, "v", 1.0) - expected) < 1e-12
    }

  property("duplicate rate counts rows in key-groups of size>1") =
    Prop.forAllNoShrink(Gen.listOfN(10, Gen.choose(0, 4))) { (keys: List[Int]) =>
      import spark.implicits._
      val df = keys.toDF("k")
      val expected = keys.groupBy(identity).values
        .filter(_.size > 1).map(_.size).sum.toDouble / keys.size
      math.abs(Gates.checkDuplicateRate(df, Seq("k"), 1.0) - expected) < 1e-12
    }
}
