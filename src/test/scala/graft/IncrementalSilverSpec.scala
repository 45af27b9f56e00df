package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.layers.{IncrementalSilver, Medallion}
import graft.quality.DataQualityError
import graft.sources.VersionedTable

/** Incremental silver: changesets flow through the same dedup/gate/enrich
  * discipline as the full refresh, then MERGE into a versioned snapshot —
  * updates win by key, history stays time-travelable, and a gate breach
  * on the increment leaves the current snapshot untouched. */
class IncrementalSilverSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // days_since_prior nulls are 2/3 of the tiny fixture (every first order)
  // — scale that gate out; the breach test targets the zero-tolerance
  // required-column gate instead
  private val cfg = Medallion.Config(
    rawDir = "", bronzeDir = "", silverDir = "", goldDir = "",
    nullRateDaysSincePrior = 1.0)

  private def orders(rows: (Int, Int, String, Int, Int, Int, Option[Float])*) =
    rows.toSeq.toDF("order_id", "user_id", "eval_set", "order_number",
      "order_dow", "order_hour_of_day", "days_since_prior_order")

  test("bootstrap + increment: updates win by key, inserts land, history retained") {
    val root = Files.createTempDirectory("graft_inc_silver").toString
    val v1 = IncrementalSilver.bootstrap(spark, root,
      orders((1, 10, "prior", 1, 0, 8, None), (2, 10, "prior", 2, 3, 14, Some(7.0f)),
        (3, 20, "prior", 1, 1, 9, None)), cfg)
    assert(v1 == 1L)
    // changeset: order 2 moves to hour 20 (Evening bucket), order 4 is new,
    // and the batch carries an internal duplicate the dedup must collapse
    val v2 = IncrementalSilver.applyIncrement(spark, root,
      orders((2, 10, "prior", 2, 3, 20, Some(7.0f)), (2, 10, "prior", 2, 3, 20, Some(7.0f)),
        (4, 20, "prior", 2, 2, 23, Some(3.0f))), cfg)
    assert(v2 == 2L)
    val latest = VersionedTable.readLatest(spark, root)
      .select(col("order_id"), col("order_hour_of_day"), col("order_time_bucket"))
      .as[(Int, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(latest.keySet == Set(1, 2, 3, 4))
    assert(latest(2) == ((20, "Evening")))  // update applied + re-enriched
    assert(latest(4)._1 == 23)              // insert landed
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 3) // time travel
  }

  test("changeset with a new column: rejected by default, merges as nullable with allowEvolution") {
    val root = Files.createTempDirectory("graft_inc_evolve").toString
    IncrementalSilver.bootstrap(spark, root,
      orders((1, 10, "prior", 1, 0, 8, None), (2, 10, "prior", 2, 3, 14, Some(7.0f))), cfg)
    // the changeset schema evolved upstream: a new `channel` column
    val evolved = orders((2, 10, "prior", 2, 3, 20, Some(7.0f)),
      (3, 20, "prior", 1, 1, 9, None))
      .withColumn("channel", lit("app"))
    intercept[IllegalArgumentException] { // overwriteSchema=false analogue
      IncrementalSilver.applyIncrement(spark, root, evolved, cfg)
    }
    assert(VersionedTable.latestVersion(root).contains(1L)) // reject left v1 live
    val v2 = IncrementalSilver.applyIncrement(spark, root, evolved, cfg,
      allowEvolution = true)
    assert(v2 == 2L)
    val latest = VersionedTable.readLatest(spark, root)
      .select(col("order_id"), col("channel"))
      .as[(Int, Option[String])].collect().toMap
    // updated/inserted rows carry the new column; pre-existing rows read NULL
    assert(latest == Map(1 -> None, 2 -> Some("app"), 3 -> Some("app")))
    // type change on an existing column is rejected even with evolution on
    val badType = orders((4, 30, "prior", 1, 1, 9, None))
      .withColumn("order_dow", col("order_dow").cast("string"))
    intercept[IllegalArgumentException] {
      IncrementalSilver.applyIncrement(spark, root, badType, cfg, allowEvolution = true)
    }
  }

  test("a gate breach on the increment halts before writing; snapshot untouched") {
    val root = Files.createTempDirectory("graft_inc_gate").toString
    IncrementalSilver.bootstrap(spark, root,
      orders((1, 10, "prior", 1, 0, 8, None)), cfg)
    val bad = Seq((Option.empty[Int], 10, "prior", 2, 3, 14, Some(7.0f)))
      .toDF("order_id", "user_id", "eval_set", "order_number",
        "order_dow", "order_hour_of_day", "days_since_prior_order")
    intercept[DataQualityError] {
      IncrementalSilver.applyIncrement(spark, root, bad, cfg)
    }
    assert(VersionedTable.latestVersion(root).contains(1L)) // nothing written
  }
}
