package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKRewrite: the declarative row_number top-k idiom compiles into the
  * bounded-heap GroupedTopK in GraftExtensions sessions — and every
  * conservatism guard declines exactly when it should. */
class TopKRewriteSpec extends AnyFunSuite {

  private def withExtensionsSession[A](f: SparkSession => A): A = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .withExtensions(new GraftExtensions()).getOrCreate()
      try f(sess)
      finally { SparkSession.clearActiveSession(); SparkSession.clearDefaultSession() }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def fixture(sess: SparkSession): DataFrame =
    sess.range(200).select((col("id") % 7).as("g"), col("id").as("v"),
      (col("id") * 3 % 11).as("x"))

  private val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("x"))

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("row_number + filter + drop rewrites to GroupedTopK, results identical") {
    withExtensionsSession { sess =>
      val idiom = fixture(sess)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
      val plan = planOf(idiom)
      assert(plan.contains("GroupedTopK"), s"expected the rewrite, got:\n$plan")
      assert(!plan.contains("Window"), s"the Window must be gone:\n$plan")
      // equality vs the un-rewritten computation on the base session
      val base = fixture(TestSpark.spark)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = idiom.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == base)
    }
  }

  test("rn = 1 (dedup-first idiom) and rn < k also rewrite") {
    withExtensionsSession { sess =>
      val eq1 = fixture(sess).withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      assert(planOf(eq1).contains("GroupedTopK"))
      assert(eq1.count() == 7) // one row per group
      val lt = fixture(sess).withColumn("rn", row_number().over(w))
        .filter(col("rn") < 3).drop("rn")
      assert(planOf(lt).contains("GroupedTopK"))
      assert(lt.count() == 14) // k normalized to 2
    }
  }

  test("guards decline: rank kept, rank(), extra conjunct, no partition, k<1") {
    withExtensionsSession { sess =>
      val kept = fixture(sess).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3) // rn survives in the output
      assert(!planOf(kept).contains("GroupedTopK"))

      val ranked = fixture(sess).withColumn("rk", rank().over(w))
        .filter(col("rk") <= 3).drop("rk") // ties — not rewritable
      assert(!planOf(ranked).contains("GroupedTopK"))

      val conj = fixture(sess).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 && col("v") > 10).drop("rn")
      assert(!planOf(conj).contains("GroupedTopK"))

      val nopart = fixture(sess)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("v").desc)))
        .filter(col("rn") <= 3).drop("rn")
      assert(!planOf(nopart).contains("GroupedTopK"))

      val kzero = fixture(sess).withColumn("rn", row_number().over(w))
        .filter(col("rn") < 1).drop("rn")
      assert(!planOf(kzero).contains("GroupedTopK"))
      assert(kzero.count() == 0)
    }
  }
}
