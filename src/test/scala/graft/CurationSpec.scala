package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.CurationQueries

/** Round-5 curation wave: BPE merge learning, DSIR reweighting, triangle
  * counting, blocked kNN join, column profiler. The DuckDB oracle verifies
  * each end-to-end at sf0.01; here the semantics are pinned against
  * serial reference implementations on fixtures (the oracle replays the
  * same distributed algorithm — a serial reference catches bugs the
  * replay would faithfully reproduce), plus the plan properties that make
  * each shape scale.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ----- serial references ------------------------------------------------

  /** Greedy left-to-right single-pair merge (reference BPE semantics). */
  private def serialMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (x <- syms) {
      if (out.nonEmpty && out.last == a && x == b) { out.remove(out.size - 1); out += (a + b) }
      else out += x
    }
    out.toVector
  }

  /** Full serial BPE: word-freq vocab, k rounds of (argmax pair by
    * (weight desc, pair asc)) + merge. */
  private def serialBpe(words: Seq[String], k: Int): Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[String, (Vector[String], Long)] =
      words.filter(_.nonEmpty).groupBy(identity).map { case (w, g) =>
        w -> (w.map(_.toString).toVector, g.size.toLong)
      }
    (1 to k).flatMap { step =>
      val weights = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (syms, f)) <- vocab; Seq(x, y) <- syms.sliding(2))
        weights((x, y)) = weights.getOrElse((x, y), 0L) + f
      if (weights.isEmpty) None
      else {
        val ((a, b), w) = weights.minBy { case ((x, y), wt) => (-wt, x + " " + y) }
        vocab = vocab.map { case (k0, (syms, f)) => k0 -> (serialMerge(syms, a, b), f) }
        Some((step.toLong, a, b, a + b, w))
      }
    }
  }

  /** Unsigned 32-bit md5-prefix bucket, matching md5/conv in both engines. */
  private def md5Mod(s: String, m: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d, 16) % m
  }

  private def tmpTable(dir: String, name: String, df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_curation").toString

  // ----- mergeFold --------------------------------------------------------

  test("mergeFold matches serial greedy merge, incl. overlap chains") {
    // (syms, a, b): overlapping same-symbol runs, back-to-back pairs
    // (the case a non-overlapping string replace of " a b " gets wrong),
    // no-op merges, single-symbol words, multi-char symbols
    val cases = Seq(
      ("a a a a", "a", "a"), ("a a a", "a", "a"), ("a b a b", "a", "b"),
      ("a a b", "a", "b"), ("x a b y a b", "a", "b"), ("b a b a", "b", "a"),
      ("q", "a", "b"), ("a b", "a", "b"), ("ab ab ab", "ab", "ab"),
      ("x y", "a", "b"), ("aa a aa a", "aa", "a"))
    val df = cases.map(_._1).toDF("s")
    for (((_, a, b), i) <- cases.zipWithIndex) {
      val got = df.filter(col("s") === cases(i)._1)
        .select(CurationQueries.mergeFold(split(col("s"), " "), a, b))
        .head().getString(0)
      val want = serialMerge(cases(i)._1.split(" ").toVector, a, b).mkString(" ")
      assert(got == want, s"case ${cases(i)}")
    }
  }

  // ----- bpeTrain ---------------------------------------------------------

  test("bpeTrain matches serial BPE on the classic corpus") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val dir = tmpDir()
    tmpTable(dir, "documents", Seq((1L, corpus.take(8).mkString(" ")),
      (2L, corpus.drop(8).mkString(" "))).toDF("doc_id", "text"))
    val got = CurationQueries.bpeTrain(spark, dir, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val want = serialBpe(corpus, 8)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // sanity on the classic fixture: "est" forms within 3 merges
    assert(got.map(_._4).take(3).contains("es") || got.map(_._4).take(3).contains("st"))
  }

  test("bpeTrain merge rounds never rescan the corpus (vocab checkpointed)") {
    val dir = tmpDir()
    tmpTable(dir, "documents",
      Seq((1L, "aa ab aa ab ba")).toDF("doc_id", "text"))
    // After training, re-derive one pair-count round from the final vocab
    // shape the way bpeTrain does: the input must be a checkpointed local
    // table, not a parquet scan. bpeTrain is self-contained, so assert the
    // equivalent observable: training with a deleted corpus DIR fails, but
    // the returned (driver-materialized) merge table stays usable.
    val merges = CurationQueries.bpeTrain(spark, dir, 3)
    val n = merges.count()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    assert(merges.count() == n) // no lazy parquet dependency in the result
  }

  test("bpeTrainState segmentation is lossless: pieces rebuild each word") {
    val corpus = Seq.fill(4)("banana") ++ Seq.fill(3)("bandana") ++ Seq.fill(2)("ban")
    val dir = tmpDir()
    tmpTable(dir, "documents", Seq((1L, corpus.mkString(" "))).toDF("doc_id", "text"))
    val (merges, vocab) = CurationQueries.bpeTrainState(spark, dir, 5)
    val words = vocab.select(concat_ws("", col("syms"))).collect().map(_.getString(0)).toSet
    assert(words == Set("banana", "bandana", "ban"))
    // merged pieces longer than 1 char exist after 5 rounds
    val pieces = vocab.select(explode(col("syms"))).collect().map(_.getString(0)).toSet
    assert(pieces.exists(_.length > 1))
    assert(merges.count() == 5)
  }

  test("q_diversity: uniform vs template-spam sources") {
    val dir = tmpDir()
    tmpTable(dir, "documents", Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" "), "uniform"),
      (2L, Seq.fill(10)("spam").mkString(" "), "spam"))
      .toDF("doc_id", "text", "source"))
    val got = CurationQueries.queries("q_diversity")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got("uniform") == ((10L, 10L, 1.0, 0.9))) // gini = 1 - 10/100
    assert(got("spam") == ((10L, 1L, 0.1, 0.0)))
  }

  // ----- triangles --------------------------------------------------------

  test("triangleStats: K4 + pendant, star, path") {
    // K4 on 1..4 (4 triangles) + pendant 4-5
    val k4 = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5))
    val r = CurationQueries.triangleStats(k4.toDF("x", "y")).head()
    assert(r.getAs[Long]("n_nodes") == 5 && r.getAs[Long]("n_edges") == 7)
    assert(r.getAs[Long]("n_triangles") == 4)
    // deg: 3,3,3,4,1 -> wedges = 3+3+3+6+0 = 15; cc = 12/15
    assert(r.getAs[Long]("n_wedges") == 15)
    assert(r.getAs[Double]("global_cc") == 0.8)

    // star K1,5: no triangles, wedges = C(5,2) = 10
    val star = (2 to 6).map(i => (1, i))
    val s = CurationQueries.triangleStats(star.toDF("x", "y")).head()
    assert(s.getAs[Long]("n_triangles") == 0 && s.getAs[Long]("n_wedges") == 10)

    // duplicate + reversed + self-loop inputs normalize away
    val noisy = Seq((1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (3, 1))
    val t = CurationQueries.triangleStats(noisy.toDF("x", "y")).head()
    assert(t.getAs[Long]("n_edges") == 3 && t.getAs[Long]("n_triangles") == 1)
  }

  test("triangleStats matches serial count on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (for (a <- 1 to 12; b <- (a + 1) to 12 if rnd.nextDouble() < 0.4)
      yield (a, b)).toSeq
    val serial = (for (Seq((a, b), (c, d), (e, f)) <- edges.combinations(3).toSeq
      if Set(a, b, c, d, e, f).size == 3) yield 1).size
    val got = CurationQueries.triangleStats(edges.toDF("x", "y")).head()
      .getAs[Long]("n_triangles")
    assert(got == serial)
  }

  // ----- DSIR -------------------------------------------------------------

  test("q_dsir matches serial fixed-point importance scores") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog sat on the log", "en"),
      (3L, "the cat ate the fish", "en"),
      (4L, "der hund sitzt auf dem baum", "de"),
      (5L, "der fisch schwimmt im see", "de"),
      (6L, "the cat sat on the mat again", "zh"), // en-looking text, zh label
      (7L, "ein ganz anderes thema hier", "de"),
      (8L, "cat mat the sat on", "de"))
    val dir = tmpDir()
    tmpTable(dir, "documents", docs.toDF("doc_id", "text", "lang"))

    // serial replay
    val bi = docs.map { case (id, text, lang) =>
      val w = text.toLowerCase.trim.split("\\s+").toSeq
      (id, lang, w.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq)
    }
    val counts = bi.flatMap { case (id, lang, gs) =>
      gs.map(g => ((id, lang, md5Mod(g, 128)), 1L))
    }.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    val byBucket = counts.groupBy(_._1._3)
    val cRaw = byBucket.map { case (b, m) => b -> m.values.sum }
    val cTgt = byBucket.map { case (b, m) =>
      b -> m.collect { case (((_, l, _), c)) if l == "en" => c }.sum }
    val totR = cRaw.values.sum; val totT = cTgt.values.sum
    val sB = cRaw.keys.map(b =>
      b -> ((cTgt(b) * 16777216L) / totT - (cRaw(b) * 16777216L) / totR)).toMap
    val want = counts.groupBy { case ((id, lang, _), _) => (id, lang) }
      .map { case ((id, lang), m) =>
        (id, lang, m.map { case (((_, _, b), c)) => c * sB(b) }.sum) }
      .toSeq.sortBy { case (id, _, sc) => (-sc, id) }.take(25)

    val got = CurationQueries.queries("q_dsir")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want, s"got $got\nwant $want")
    // the en-looking zh doc must outscore the pure-de docs
    val score = got.map(r => r._1 -> r._3).toMap
    assert(score(6L) > score(4L) && score(6L) > score(7L))
  }

  test("q_dsir scoring plan: corpus scanned once, score vector broadcast") {
    val dir = tmpDir()
    tmpTable(dir, "documents", Seq((1L, "a b c a b", "en"), (2L, "c d e f g", "de"))
      .toDF("doc_id", "text", "lang"))
    val plan = CurationQueries.queries("q_dsir")(spark, dir)
      .queryExecution.executedPlan.toString
    // db is localCheckpoint'd: the scoring plan reads the materialized
    // (doc, bucket) table, never the parquet corpus...
    assert(!plan.contains("FileScan"), plan)
    // ...and the 128-row score vector arrives by broadcast, so the count
    // table never shuffles for the lookup
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ----- kNN join ---------------------------------------------------------

  test("q_knn_join: equi-join plan (no cartesian), valid per-key top-k") {
    val df = CurationQueries.queries("q_knn_join")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // per vec_a: ranks are 1..k contiguous, cos_sim non-increasing in rank
    rows.groupBy(_._1).foreach { case (a, g) =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.size).toSeq, s"ranks for $a")
      assert(sorted.map(_._4).sliding(2).forall {
        case Array(x, y) => x >= y; case _ => true }, s"cos order for $a")
      assert(g.forall(_._2 != a))
    }
  }

  test("q_semdedup: one keep per group, groups stay within clusters") {
    val rows = CurationQueries.queries("q_semdedup")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == 500)
    val byGrp = rows.groupBy(_._3)
    // exactly one kept representative per duplicate group
    byGrp.foreach { case (g, m) => assert(m.count(_._4) == 1, s"group $g") }
    // a dropped vector implies a non-singleton group; members share a cluster
    byGrp.filter(_._2.exists(!_._4)).foreach { case (g, m) =>
      assert(m.length >= 2, s"group $g")
      assert(m.map(_._2).toSet.size == 1, s"group $g spans centroids")
    }
    // the synthetic corpus does contain semantic near-dups at τ=0.35
    assert(rows.count(!_._4) > 0)
  }

  test("q_redact scrubs constructed and embedded PII, counts matches") {
    val dir = tmpDir()
    tmpTable(dir, "customer", Seq(
      (5L, "Customer#X"),
      (7L, "bob bob.smith@corp.io")) // PII embedded in the name too
      .toDF("c_custkey", "c_name"))
    val got = CurationQueries.queries("q_redact")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((5L, 1L, 1L, "reach Customer#X at <EMAIL> or <PHONE> ok")))
    assert(got(1) == ((7L, 2L, 1L, "reach bob <EMAIL> at <EMAIL> or <PHONE> ok")))
  }

  // ----- profiler ---------------------------------------------------------

  test("q_profile counts nulls/distincts and canonicalizes min/max") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, Option(10L), Option("O"), Option(100.25), Option(ts("1995-01-03 00:00:00")), Option("1-URGENT")),
      (2L, Option(11L), Option("F"), Option(17.5), Option(ts("1996-06-15 00:00:00")), Option("3-MEDIUM")),
      (3L, None: Option[Long], Option("O"), None: Option[Double], Option(ts("1994-02-01 00:00:00")), None: Option[String]),
      (4L, Option(10L), None: Option[String], Option(9999.99), None: Option[java.sql.Timestamp], Option("1-URGENT")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val dir = tmpDir()
    tmpTable(dir, "orders", rows)
    val got = CurationQueries.queries("q_profile")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got("o_orderkey") == ((4L, 0L, 4L, "1", "4")))
    assert(got("o_custkey") == ((4L, 1L, 2L, "10", "11")))
    assert(got("o_orderstatus") == ((4L, 1L, 2L, "F", "O")))
    assert(got("o_totalprice") == ((4L, 1L, 3L, "1750", "999999")))
    assert(got("o_orderdate") == ((4L, 1L, 3L, "1994-02-01", "1996-06-15")))
    assert(got("o_orderpriority") == ((4L, 1L, 2L, "1-URGENT", "3-MEDIUM")))
  }

  test("kcoreEdges: cascade peel on a chained fixture, fixpoint stability") {
    // K4 core {0,1,2,3} with a pendant chain 3-4-5: at k=2 the chain
    // peels one node per round (5 first, then 4), so 2 rounds reach the
    // fixpoint and a 3rd changes nothing
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a != b) yield (a, b)
    val chain = Seq((3L, 4L), (4L, 3L), (4L, 5L), (5L, 4L))
    val e = (k4 ++ chain).toDF("src", "dst")
    def core(rounds: Int): Set[(Long, Long)] =
      graft.queries.CurationQueries.kcoreEdges(e, k = 2, rounds = rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core(1).exists(_._1 == 4L), "one round only peels the chain tail")
    assert(core(2) == k4.toSet, "two rounds peel the whole chain")
    assert(core(3) == k4.toSet, "fixpoint: further rounds are no-ops")
  }

  test("kcoreEdges matches a serial peel on random graphs") {
    def serial(edges: Set[(Long, Long)], k: Int, rounds: Int): Set[(Long, Long)] = {
      var e = edges
      for (_ <- 1 to rounds) {
        val deg = e.groupBy(_._1).map { case (n, es) => n -> es.size }
        val alive = deg.filter(_._2 >= k).keySet
        e = e.filter { case (a, b) => alive(a) && alive(b) }
      }
      e
    }
    val rng = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val n = 10 + trial * 2
      val und = (1 to n * 2).map { _ =>
        val (a, b) = (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val sym = (und ++ und.map(e => (e._2, e._1))).toSet
      val got = graft.queries.CurationQueries
        .kcoreEdges(sym.toSeq.toDF("src", "dst"), k = 3, rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == serial(sym, 3, 4), s"trial $trial diverged from serial peel")
    }
  }
}
