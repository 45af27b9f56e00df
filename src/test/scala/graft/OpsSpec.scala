package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalactic.Tolerance._
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps._

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedupFirst keeps exactly the tie-break-first row per key") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "c", 30), (1, "a", 5))
      .toDF("k", "s", "v")
    val out = dedupFirst(df, Seq("k"), Seq(col("s"), col("v")))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1, "a", 5), (2, "c", 30)))
  }

  test("sequenceRank + lagPrev produce per-key ordered sequence and previous value") {
    val df = Seq((1, 10, "x"), (1, 20, "y"), (2, 5, "z")).toDF("k", "t", "v")
    val out = lagPrev(
      sequenceRank(df, Seq("k"), Seq(col("t"))),
      col("v"), Seq("k"), Seq(col("t")), "none", "prev")
      .orderBy("k", "t").collect()
    assert(out.map(r => (r.getInt(0), r.getInt(3), r.getString(4))).toSeq ==
      Seq((1, 1, "none"), (1, 2, "x"), (2, 1, "none")))
  }

  test("dayNameInstacart maps 0 to Saturday (reference 02:73-79)") {
    val out = Seq(0, 1, 6).toDF("d")
      .select(dayNameInstacart(col("d"))).as[String].collect()
    assert(out.toSeq == Seq("Saturday", "Sunday", "Friday"))
  }

  test("hourBucket: all 24 hours pinned (reference 02:80-83)") {
    // Morning 5-11, Afternoon 12-16, Evening 17-20, Night otherwise —
    // the reference's exact BETWEEN boundaries; hour 21 is Night.
    val out = (0 to 23).toDF("h")
      .orderBy("h").select(hourBucket(col("h"))).as[String].collect()
    val expected =
      Seq.fill(5)("Night") ++ Seq.fill(7)("Morning") ++
        Seq.fill(5)("Afternoon") ++ Seq.fill(4)("Evening") ++ Seq.fill(3)("Night")
    assert(out.toSeq == expected)
  }

  test("surrogateKey equals md5 of underscore-joined parts (reference 03:85-88)") {
    val out = Seq((12, 34)).toDF("a", "b")
      .select(surrogateKey(col("a"), col("b"))).as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("12_34".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == expected)
  }

  test("safeDiv yields null on zero denominator, not an error") {
    val out = Seq((10, 0), (10, 2)).toDF("a", "b")
      .select(safeDiv(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0) && out(1).getDouble(0) == 5.0)
  }

  test("rnd rounds to nearest; ties resolved by the binary value (engine-portable)") {
    // 1222.745 is stored as 1222.74499... -> down; 0.125 is exact binary -> up
    val out = Seq(1222.745, 0.125, 2.0, 1.004, 1.006).toDF("x")
      .select(rnd(col("x"), 2)).as[Double].collect()
    assert(out.toSeq == Seq(1222.74, 0.13, 2.0, 1.0, 1.01))
  }

  test("withPctOfTotal sums to 100") {
    val df = Seq(("a", 25L), ("b", 75L)).toDF("k", "n")
    val out = withPctOfTotal(df, "n", df, sum(col("n")).cast("double"), "pct", 4)
    assert(out.agg(sum(col("pct"))).as[Double].head() === 100.0 +- 1e-9)
  }

  test("topK returns k rows in order") {
    val df = (1 to 100).toDF("v")
    val out = topK(df, 3, col("v").desc).as[Int].collect()
    assert(out.toSeq == Seq(100, 99, 98))
  }

  test("incremental aggregate maintenance: merge == rebuild, zero-count groups drop") {
    // base (k%10!=0): A{1,2,3,13}, B{7,21}; deletes (k%7==0): A{21?no->B}, ...
    // crafted so group B's rows are ALL deleted and no insert refills it:
    // the merged view must not contain a (B, 0, 0) row.
    val dir = java.nio.file.Files.createTempDirectory("graft_incagg").toString
    val rows = Seq(
      ("A", 1L, 10.00), ("A", 2L, 20.00), ("A", 3L, 30.00), ("A", 13L, 40.00),
      ("B", 7L, 50.00), ("B", 21L, 60.00),       // both deleted (k%7==0)
      ("C", 10L, 70.00), ("A", 20L, 80.00))      // inserts (k%10==0)
    rows.toDF("o_orderpriority", "o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.queries.RelationalQueries.queries("q_incremental_agg")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // final set: inserts {C10, A20} + base minus deletes {A1, A2, A3, A13}
    assert(got == Seq(("A", 5L, 18000L), ("C", 1L, 7000L)))
    assert(!got.exists(_._1 == "B"), "fully-retracted group must drop out")
  }
}
