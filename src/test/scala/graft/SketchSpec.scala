package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.SketchQueries

/** Round-5 sketch + exact-similarity wave: the prefix-filtered set-
  * similarity join against a brute-force reference (crafted boundary
  * cases + fuzz), and serial md5 re-derivations of the count-min and
  * HyperLogLog estimates (both are deterministic by construction, so the
  * serial reference must match EXACTLY — not approximately). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpTable(dir: String, name: String, df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_sketch").toString

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ----- set-similarity join ---------------------------------------------

  /** Naive reference: trigram-shingle sets, all pairs, J ≥ τN/τD kept. */
  private def serialSetSim(docs: Seq[(Long, String)],
                           tauN: Long, tauD: Long): Set[(Long, Long, Int, Int)] = {
    val sets = docs.map { case (id, text) =>
      val w = text.trim.toLowerCase.split("\\s+").toSeq
      id -> (if (w.size >= 3) w.sliding(3).map(_.mkString(" ")).toSet else Set.empty[String])
    }.filter(_._2.nonEmpty)
    (for {
      (a, ta) <- sets; (b, tb) <- sets if a < b
      common = (ta & tb).size; union = (ta | tb).size
      if common * tauD >= union * tauN
    } yield (a, b, common, union)).toSet
  }

  private def runSetSim(docs: Seq[(Long, String)],
                        tauN: Long, tauD: Long): Set[(Long, Long, Int, Int)] =
    SketchQueries.setSimJoin(docs.toDF("doc_id", "text"), tauN, tauD)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt, r.getLong(3).toInt)).toSet

  test("setsim join equals brute force on boundary fixtures") {
    val docs = Seq(
      1L -> "a b c d e f",   // {abc,bcd,cde,def}
      2L -> "a b c d e f",   // identical → J = 1 with doc 1
      3L -> "a b c d x y",   // J(1,3) = 2/6 = 1/3 < 1/2 → excluded
      4L -> "a b c d e z",   // J(1,4) = 3/5 → included
      5L -> "a b c d e",     // {abc,bcd,cde}: J(1,5) = 3/4; J(4,5)=2/4 boundary
      6L -> "z a b c d",     // {zab,abc,bcd}: J(5,6) = 2/4 = exactly τ → included
      7L -> "p q r s t",     // disjoint from everything
      8L -> "hi there")      // < 3 tokens → no shingles, dropped entirely
    val got = runSetSim(docs, 1L, 2L)
    val want = serialSetSim(docs, 1L, 2L)
    assert(got == want, s"got $got\nwant $want")
    assert(want.contains((5L, 6L, 2, 4)), "the exact-τ boundary pair must be kept")
    assert(!want.contains((1L, 3L, 2, 6)), "below-τ pair must be dropped")
  }

  test("setsim τ=4/5: exact-boundary pair kept under integer length bounds") {
    // B's 4 shingles ⊂ A's 5 → J = 4/5 = τ exactly. |B| = ⌈τ|A|⌉ = 4 sits
    // ON the length-filter boundary: a float ceil(5 · 0.8) = 5 (0.8₂ > 4/5)
    // would prune it; the integer bound keeps it.
    val docs = Seq(1L -> "a b c d e f g", 2L -> "a b c d e f", 3L -> "p q r s t u")
    val got = runSetSim(docs, 4L, 5L)
    assert(got == serialSetSim(docs, 4L, 5L))
    assert(got.contains((1L, 2L, 4, 5)), "the exact-0.8 subset pair must survive")
  }

  test("setsim join equals brute force on random corpora with seeded near-dups") {
    val rng = new scala.util.Random(23)
    val vocab = Vector("red", "blue", "fox", "jumps", "over", "lazy", "dog", "runs")
    val base = (1L to 15L).map { id =>
      id -> Vector.fill(5 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
    }
    // mutate one token of each base doc → a guaranteed population of
    // above- and near-threshold pairs (plus the random background)
    val docs = base.map { case (id, w) => id -> w.mkString(" ") } ++
      base.map { case (id, w) =>
        val i = rng.nextInt(w.size)
        (id + 100L) -> w.updated(i, vocab(rng.nextInt(vocab.size))).mkString(" ")
      } ++
      // two exact copies guarantee a J = 1 pair at every τ
      Seq(200L -> base.head._2.mkString(" "))
    for ((tn, td) <- Seq((1L, 2L), (4L, 5L))) {
      val want = serialSetSim(docs, tn, td)
      assert(want.nonEmpty, s"fixture must produce qualifying pairs at tau=$tn/$td")
      assert(runSetSim(docs, tn, td) == want, s"tau=$tn/$td")
    }
  }

  test("setsim plan has no cross product — candidates come from the prefix equi-join") {
    val docs = (1L to 8L).map(i => i -> s"w$i x$i y$i z$i a b c").toDF("doc_id", "text")
    val plan = SketchQueries.setSimJoin(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must be the prefix-token equi-join, got:\n$plan")
  }

  // ----- count-min sketch -------------------------------------------------

  test("count-min estimates match a serial md5 re-derivation exactly") {
    val dir = tmpDir()
    // skewed corpus: token frequency spans 3 orders of magnitude
    val rng = new scala.util.Random(5)
    val vocab = (1 to 60).map(i => s"tok$i")
    val text = (1 to 4000).map { _ =>
      val r = rng.nextInt(100)
      if (r < 40) "hot" else if (r < 60) "warm" else vocab(rng.nextInt(vocab.size))
    }.mkString(" ")
    tmpTable(dir, "documents", Seq((1L, text)).toDF("doc_id", "text"))

    val toks = text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val freq = toks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val sketch = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    for (t <- toks; i <- 0 until 4)
      sketch((i, java.lang.Long.parseLong(md5hex(s"$i:$t").substring(0, 8), 16) % 1024)) += 1L
    def est(t: String): Long = (0 until 4).map(i =>
      sketch((i, java.lang.Long.parseLong(md5hex(s"$i:$t").substring(0, 8), 16) % 1024))).min
    val top = freq.toSeq.sortBy { case (t, f) => (-f, t) }.take(10)

    val got = SketchQueries.queries("q_cms_topk")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == top.map { case (t, f) => (t, f, est(t), est(t) - f) },
      "sketch estimates must be bit-identical to the serial reference")
    // the CMS contract: one-sided error
    assert(got.forall(r => r._3 >= r._2), "estimate must never undercount")
  }

  // ----- histogram quantiles ----------------------------------------------

  test("histogram quantile brackets contain the exact disc quantile") {
    val dir = tmpDir()
    val rng = new scala.util.Random(31)
    // long-tailed prices with cent precision over ~60 bins
    val prices = (1 to 3000).map(_ =>
      math.floor(math.pow(10.0, 3.0 + rng.nextDouble() * 1.8) * 100) / 100.0)
    tmpTable(dir, "lineitem", prices.zipWithIndex.map { case (p, i) =>
      (i.toLong, p) }.toDF("l_orderkey", "l_extendedprice"))

    val cents = prices.map(p => math.floor(p * 100 + 0.5).toLong).sorted
    val n = cents.size.toLong
    def bracket(pn: Long, pd: Long): (Long, Long) = {
      val target = ((n * pn + pd - 1) / pd).toInt
      val exact = cents(target - 1) // disc quantile: element at ⌈p·n⌉ (1-based)
      val bin = exact / 100000L
      (bin * 100000L, (bin + 1) * 100000L - 1)
    }
    val rows = SketchQueries.queries("q_hist_quantile")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for ((p, (pn, pd)) <- Seq("p50" -> (1L, 2L), "p90" -> (9L, 10L), "p99" -> (99L, 100L))) {
      val (lo, hi, got_n) = rows(p)
      assert(got_n == n)
      val target = ((n * pn + pd - 1) / pd).toInt
      val exact = cents(target - 1)
      assert(lo <= exact && exact <= hi,
        s"$p: exact disc quantile $exact outside reported bracket [$lo, $hi]")
      assert((lo, hi) == bracket(pn, pd), s"$p bracket must be the exact quantile's bin")
    }
  }

  // ----- HyperLogLog ------------------------------------------------------

  test("HLL registers and estimate match a serial md5 re-derivation exactly") {
    val dir = tmpDir()
    val rng = new scala.util.Random(17)
    // 5000 rows over ~1400 distinct keys (mid-range for m=256 — the
    // band the raw estimate is designed for)
    val keys = (1 to 5000).map(_ => 1 + rng.nextInt(1500))
    tmpTable(dir, "orders", keys.zipWithIndex.map { case (k, i) =>
      (i.toLong, k.toLong, s"G${k % 3}") }.toDF("o_orderkey", "o_custkey", "o_orderpriority"))

    val regs = scala.collection.mutable.Map.empty[Long, Long]
    for (k <- keys) {
      val h = md5hex(k.toString)
      val bucket = java.lang.Long.parseLong(h.substring(0, 2), 16)
      val v = java.lang.Long.parseLong(h.substring(2, 15), 16)
      val rho = if (v == 0) 53L else 53L - java.lang.Long.toBinaryString(v).length
      regs(bucket) = math.max(regs.getOrElse(bucket, 0L), rho)
    }
    val s = regs.values.map(mj => 1L << (53 - mj).toInt).sum
    val raw = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 /
      ((256L - regs.size).toDouble + s.toDouble / 9007199254740992.0)
    def rnd2(x: Double) = math.floor(x * 100.0 + 0.5) / 100.0
    val exact = keys.distinct.size.toLong

    val row = SketchQueries.queries("q_hll_est")(spark, dir).head()
    assert(row.getLong(0) == keys.size.toLong)
    assert(row.getLong(1) == exact)
    assert(row.getLong(2) == regs.size.toLong, "occupied register count")
    assert(row.getDouble(3) == rnd2(raw), "estimate must be bit-identical")
    assert(row.getDouble(4) == rnd2((raw - exact) / exact * 100.0))
    // sanity: the estimate is actually close (±10% at n≈1400, m=256)
    assert(math.abs(raw - exact) / exact < 0.10,
      s"HLL estimate $raw too far from exact $exact")

    // per-group form: same register math per group, serial re-derivation
    val byGrp = keys.groupBy(k => s"G${k % 3}")
    val grpRows = SketchQueries.queries("q_hll_groups")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(grpRows.keySet == byGrp.keySet)
    for ((g, ks) <- byGrp) {
      val regs = scala.collection.mutable.Map.empty[Long, Long]
      for (k <- ks) {
        val h = md5hex(k.toString)
        val bucket = java.lang.Long.parseLong(h.substring(0, 2), 16)
        val v = java.lang.Long.parseLong(h.substring(2, 15), 16)
        val rho = if (v == 0) 53L else 53L - java.lang.Long.toBinaryString(v).length
        regs(bucket) = math.max(regs.getOrElse(bucket, 0L), rho)
      }
      val sg = regs.values.map(mj => 1L << (53 - mj).toInt).sum
      val rawG = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 /
        ((256L - regs.size).toDouble + sg.toDouble / 9007199254740992.0)
      val (nEx, nRegs, est) = grpRows(g)
      assert(nEx == ks.distinct.size.toLong && nRegs == regs.size.toLong)
      assert(est == rnd2(rawG), s"group $g estimate must be bit-identical")
    }
  }

  test("Hll helper: multi-column groups and the global (no-group) form") {
    import graft.ops.Hll
    val df = (1 to 2000).map(i => (s"a${i % 2}", s"b${i % 3}", (i % 700).toLong))
      .toDF("ga", "gb", "k")
    val acd = Hll.approxCountDistinct(df, col("k"), "ga", "gb")
    val estIdx = acd.columns.indexOf("est")
    val got = acd.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(estIdx)).toMap
    assert(got.size == 6, "2x3 group combinations")
    // wiring check, not an accuracy pin (the serial re-derivation test
    // covers bit-exactness): 20% tolerance ≈ 3σ at m = 256
    val exact = (1 to 2000).groupBy(i => (s"a${i % 2}", s"b${i % 3}"))
      .view.mapValues(_.map(_ % 700).distinct.size).toMap
    for ((g, est) <- got)
      assert(math.abs(est - exact(g)) / exact(g) < 0.20,
        s"group $g: est $est vs exact ${exact(g)}")
    // no-group call gives a single global sketch row whose state merges
    // from the same registers
    val glob = Hll.approxCountDistinct(df, col("k"))
    assert(glob.count() == 1)
    val gEst = glob.head.getDouble(glob.columns.indexOf("est"))
    assert(math.abs(gEst - 700.0) / 700.0 < 0.20, s"global est $gEst vs 700")
  }
}
