package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property tests for the round-4 corpus operators (chunking, sequence
  * packing, segment-level dedup, salted join). The DuckDB oracle verifies
  * these end-to-end at sf0.01; the tests here pin the SEMANTIC invariants
  * on hand-built fixtures where the expected answer is derivable by hand,
  * plus the plan property that makes each shape scale.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  private def tmpDocs(texts: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    docsOf(texts: _*).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(n: Int, prefix: String = "w"): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("chunking: count formula, boundary cases, full token coverage") {
    // sizes straddling the 40-token window / 30-token stride boundaries:
    // n<=40 -> 1 chunk; n=41 -> 2; n=70 -> 2 (31..70 covers the tail); n=71 -> 3
    val dir = tmpDocs(
      1L -> words(10), 2L -> words(40), 3L -> words(41),
      4L -> words(70), 5L -> words(71), 6L -> words(99))
    val out = graft.queries.LlmQueries.queries("q_chunk")(spark, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_chunk_tokens").as("tok_sum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 == 1 && out(2L)._1 == 1)
    assert(out(3L)._1 == 2 && out(4L)._1 == 2)
    assert(out(5L)._1 == 3 && out(6L)._1 == 3)
    // stride 30 / window 40 => every token of doc 6 (99 tokens) is covered
    // and overlap tokens are double-counted: 99 + 2 overlaps of 10... the
    // 3 chunks cover [1,40],[31,70],[61,99] -> 40+40+39 tokens
    assert(out(6L)._2 == 40 + 40 + 39)
    // n=41: [1,40],[31,41] -> 40+11
    assert(out(3L)._2 == 40 + 11)
  }

  test("packing: bucketed prefix sum == global prefix sum, mass conserved") {
    import org.apache.spark.sql.expressions.Window
    // 350 docs spanning several 100-doc buckets, irregular sizes
    val fixture = (0L until 350L).map(i => i -> words((i % 97 + 3).toInt))
    val dir = tmpDocs(fixture: _*)
    val packed = graft.queries.LlmQueries.queries("q_pack")(spark, dir)
    val rows = packed.collect()
    // mass conservation: every token lands in exactly one sequence
    val totalTokens = fixture.map(_._2.split(" ").length.toLong).sum
    assert(rows.map(_.getAs[Long]("seq_tokens")).sum == totalTokens)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 350L)
    // equivalence with the naive single-partition global window
    val naive = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("seq_id", floor((col("cum") - col("n_tokens")) / lit(512L)).cast("long"))
      .groupBy("seq_id").agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
    val naiveMap = naive.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val k = r.getAs[Long]("seq_id")
      assert(naiveMap(k) == (r.getAs[Long]("n_docs"), r.getAs[Long]("seq_tokens")),
        s"seq $k diverges from global-window packing")
    }
    // the scale property: no window runs over an unpartitioned full table —
    // every window spec in the plan either partitions by bkt or consumes
    // the tiny per-bucket aggregate (bounded by n_docs / bucket_width)
    val plan = packed.queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(doc_id"),
      s"global-order window over the corpus found:\n$plan")
  }

  test("split packing: sequences are exactly cap tokens, fragments tile each doc") {
    val fixture = (0L until 350L).map(i => i -> words((i % 97 + 3).toInt))
    val dir = tmpDocs(fixture: _*)
    val rows = graft.queries.LlmQueries.queries("q_pack_split")(spark, dir).collect()
    val total = fixture.map(_._2.split(" ").length.toLong).sum
    assert(rows.map(_.getAs[Long]("frag_tokens")).sum == total)
    // every sequence holds exactly 512 tokens except the last
    val bySeq = rows.groupBy(_.getAs[Long]("seq_id"))
      .view.mapValues(_.map(_.getAs[Long]("frag_tokens")).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (k, s) =>
      if (k != lastSeq) assert(s == 512L, s"seq $k holds $s tokens")
      else assert(s <= 512L)
    }
    // fragments tile each doc: start at 0, contiguous, cover n_tokens
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, fr) =>
      val sorted = fr.sortBy(_.getAs[Long]("tok_start"))
      assert(sorted.head.getAs[Long]("tok_start") == 0L)
      assert(sorted.map(_.getAs[Long]("frag_tokens")).sum ==
        fixture(d.toInt)._2.split(" ").length.toLong)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("tok_start") + x.getAs[Long]("frag_tokens") ==
            y.getAs[Long]("tok_start"), s"doc $d fragments not contiguous")
        case _ => ()
      }
    }
  }

  test("segment dedup: later copies of a segment are removed, first kept") {
    val segA = words(10, "a") // one full 10-token segment
    val segB = words(10, "b")
    val segC = words(10, "c")
    val dir = tmpDocs(
      1L -> s"$segA $segB", // doc 1: owns both segments
      2L -> s"$segB $segC", // doc 2: loses segB (doc 1 saw it first), keeps segC
      3L -> s"$segC $segC") // doc 3: loses both copies (doc 2 owns segC)
    // production artifact: the text-free drop list
    val dropped = graft.queries.LlmQueries.queries("q_dedup_segments")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seg_id"))).toSet
    assert(dropped == Set((2L, 0L), (3L, 0L), (3L, 1L)))
    // fixture path: rebuilt kept text agrees with the drop list
    val out = graft.queries.LlmQueries.dedupSegments(spark, dir, 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_kept"), r.getAs[Long]("kept_len")))).toMap
    assert(out(1L) == ((2L, 2L, (segA + " " + segB).length.toLong)))
    assert(out(2L) == ((2L, 1L, segC.length.toLong)))
    assert(out(3L) == ((2L, 0L, 0L)))
  }

  test("sliding-window span dedup catches offset-straddling duplicates the grid misses") {
    // doc 1: tokens a1..a25. doc 2 embeds a3..a17 — a 15-token duplicated
    // run — at offset 5, so NO aligned 10-token grid cell of doc 2 equals
    // one of doc 1 (recall gap quantified in NOTES.md): the segment grid
    // finds nothing. The sliding windows must recover the run's exact
    // maximal extent: doc 2 positions 5..10 start duplicated windows,
    // merged to the span [5, 20) with 6 member windows.
    val a = (1 to 25).map(i => s"a$i")
    val doc2 = (words(5, "u").split(" ") ++ a.slice(2, 17) ++ words(5, "v").split(" "))
      .mkString(" ")
    val dir = tmpDocs(1L -> a.mkString(" "), 2L -> doc2)
    val grid = graft.queries.LlmQueries.queries("q_dedup_segments")(spark, dir).collect()
    assert(grid.isEmpty, "aligned grid should miss the straddling duplicate run")
    val spans = graft.queries.LlmQueries.queries("q_dedup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq((2L, 5L, 20L, 6L)))
  }

  test("span decontamination reports the exact benchmark-matching extent") {
    // doc 0 plays the benchmark (doc_id % 50 == 0); doc 1 embeds 7 of
    // its tokens (b5..b11) at offset 4 — the 5-token windows starting at
    // positions 4, 5, 6 match, merging to the span [4, 11).
    val b = (1 to 20).map(i => s"b$i")
    val doc1 = (Seq("x1", "x2", "x3", "x4") ++ b.slice(4, 11) ++
      Seq("y1", "y2", "y3", "y4")).mkString(" ")
    val dir = tmpDocs(0L -> b.mkString(" "), 1L -> doc1)
    val spans = graft.queries.LlmQueries.queries("q_decontaminate_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq((1L, 4L, 11L, 3L)))
  }

  test("span dedup: in-document repetition keeps only the first occurrence") {
    // one doc repeating a 10-token block three times back-to-back: the
    // 2nd and 3rd copies (and every straddling window between them) are
    // one merged drop span [10, 30); the first copy survives.
    val block = words(10, "r")
    val dir = tmpDocs(7L -> s"$block $block $block")
    val spans = graft.queries.LlmQueries.queries("q_dedup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq((7L, 10L, 30L)))
  }

  test("segment dedup drop list: no exchange carries segment or document text") {
    // The scale property (PLANS.md q_dedup_segments): winner election and
    // drop-list join HASH-partition only (md5, doc_id, seg_id); text
    // stays map-side. The one non-hash exchange allowed is
    // spreadSmallInput's round-robin bootstrap of a single-FILE local
    // input — a no-op at scale where inputs have more files than slots,
    // so it is excluded here. AQE off so the physical tree is
    // traversable; the property is plan-shape, not runtime-adaptive.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dfs = Seq(
        "grid" -> graft.queries.LlmQueries
          .segmentDropList(spark, "/root/testdata/sf0.001", 10),
        "sliding" -> graft.queries.LlmQueries
          .dupSpanDropList(spark, "/root/testdata/sf0.001", 10),
        "decontaminate" -> graft.queries.LlmQueries
          .decontaminateSpans(spark, "/root/testdata/sf0.001", 5))
      val textish = Set("seg", "text", "tk", "kept_text", "col")
      for ((name, df) <- dfs) {
        val exchanges = df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
        }
        assert(exchanges.nonEmpty, s"$name: winner election must regroup on the key")
        exchanges.foreach { e =>
          val carried = e.output.map(_.name).filter(textish)
          assert(carried.isEmpty,
            s"$name: hash exchange ships text column(s) $carried:\n${e.treeString}")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("lm-fit plan: cached LM table, corpus exploded exactly twice") {
    // The shape claim (PLANS.md q_lm_fit): the vocabulary-sized count
    // table is persisted, so the head rollup and the probe join read
    // one InMemoryRelation — two corpus explodes total (probe + LM
    // build), not one per consumer.
    val df = graft.queries.LlmQueries
      .queries("q_lm_fit")(spark, "/root/testdata/sf0.001")
    try {
      // drop the cache-build subtrees (the one-time LM materialization
      // legitimately scans the corpus once; it must not count per-use)
      def depth(l: String): Int = {
        val i = l.indexOf("+-"); val j = l.indexOf(":-")
        if (i < 0) j else if (j < 0) i else math.min(i, j)
      }
      var skipBelow = -1
      val live = df.queryExecution.executedPlan.toString.linesIterator.filter { l =>
        val d = depth(l)
        if (skipBelow >= 0 && (d > skipBelow || d < 0)) false
        else if (l.contains("InMemoryRelation")) { skipBelow = d; false }
        else { skipBelow = -1; true }
      }.mkString("\n")
      val scans = "Scan parquet".r.findAllIn(live).length
      assert(scans == 1, s"expected 1 live corpus scan (the probe side), got $scans:\n$live")
      assert("InMemoryTableScan".r.findAllIn(live).length == 2,
        s"LM table must be read from cache by both consumers:\n$live")
    } finally spark.catalog.clearCache()
  }

  test("span merge invariants on random flagged-position sets") {
    // mergeSpans feeds both q_dedup_spans and q_decontaminate_spans; pin
    // its algebra on random inputs: spans are disjoint with real gaps
    // (> L between starts of adjacent islands), every flagged window is
    // covered by exactly one span, window counts sum, and each span's
    // boundaries are its member extremes.
    val L = 5
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val flagged = (1 to 3).flatMap { doc =>
        val n = 1 + rng.nextInt(12)
        Seq.fill(n)(rng.nextInt(60).toLong).distinct.map(p => (doc.toLong, p))
      }
      val out = graft.queries.LlmQueries
        .mergeSpans(flagged.toDF("doc_id", "pos"), L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.map(_._4).sum == flagged.length, s"trial $trial: window counts must sum")
      flagged.groupBy(_._1).foreach { case (doc, ps) =>
        val spans = out.filter(_._1 == doc).sortBy(_._2)
        // disjoint with genuine gaps: next span starts past this end
        spans.sliding(2).foreach {
          case Array(a, b) => assert(b._2 > a._3, s"trial $trial doc $doc: spans touch")
          case _ => ()
        }
        ps.map(_._2).foreach { p =>
          val covering = spans.filter(s => p >= s._2 && p + L <= s._3)
          assert(covering.length == 1, s"trial $trial doc $doc pos $p coverage")
        }
        spans.foreach { s =>
          val members = ps.map(_._2).filter(p => p >= s._2 && p < s._3)
          assert(members.min == s._2 && members.max + L == s._3,
            s"trial $trial doc $doc: span boundaries not member extremes")
        }
      }
    }
  }

  test("salted join: salt never changes the result, join key carries the salt") {
    val dir = "/root/testdata/sf0.001"
    val salted = graft.queries.RelationalQueries.queries("q_salted_join")(spark, dir)
    val plain = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("skew_key",
        when(col("l_orderkey") % 10 < 7, lit(0L)).otherwise(pmod(col("l_orderkey"), lit(97L))))
      .join(spark.range(97).select(col("id").as("skew_key"),
        concat(lit("grp_"), lpad(col("id").cast("string"), 2, "0")).as("grp")), Seq("skew_key"))
      .groupBy("grp").agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"))
      .orderBy("grp")
    val a = salted.collect().map(_.toSeq)
    val b = plain.collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "salted join must be result-identical to the plain join")
    // the exchange feeding the join must partition on (skew_key, _salt):
    // that composite key is what spreads the hot key over reducers — a
    // bare "_salt" projection would pass even if the join degraded to a
    // broadcast or single-key shuffle, so match the partitioning expr.
    val plan = salted.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(skew_key[^)]*_salt".r.findFirstIn(plan).isDefined,
      s"join exchange must partition on (skew_key, _salt):\n$plan")
  }

  test("rolling-hash windows: grouping-equivalent to exact window keys, shape contracts") {
    import org.apache.spark.sql.graft.NativeColumns
    // 60 tokens from a 7-word vocabulary: plenty of genuinely repeated
    // 3-token windows. The 64-bit roll must induce EXACTLY the window-text
    // partition (no false negatives by construction; a false positive
    // here would be a found 2^-64 collision).
    val vocab = Array("a", "b", "c", "d", "e", "f", "g")
    val toks = (0 until 60).map(i => vocab((i * i + i / 3) % 7))
    val df = Seq((toks.mkString(" "))).toDF("text")
      .select(split(col("text"), " ").as("tk"))
    val hs = df.select(NativeColumns.rollingHash(col("tk"), 3)).as[Seq[Long]].head
    assert(hs.length == 58, "n - w + 1 windows")
    val byText = (0 until 58).groupBy(i => toks.slice(i, i + 3).mkString(" "))
    val byHash = (0 until 58).groupBy(hs)
    assert(byText.values.map(_.toSet).toSet == byHash.values.map(_.toSet).toSet,
      "rolling hash must partition window positions exactly like window text")
    assert(byText.size < 58, "fixture must actually contain repeated windows")
    // short-array + exact-length boundary: n < w -> empty, n == w -> 1
    val edge = Seq(Seq("x", "y"), Seq("x", "y", "z")).toDF("tk")
      .select(NativeColumns.rollingHash(col("tk"), 3)).as[Seq[Long]].collect()
    assert(edge(0).isEmpty && edge(1).length == 1)
    // SQL surface via the registered function
    graft.functions.NativeFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT rolling_hash(array('p', 'q', 'r', 'p', 'q', 'r'), 3) AS h")
      .as[Seq[Long]].head
    assert(viaSql.length == 4 && viaSql(0) == viaSql(3),
      "identical windows must share a rolling key")
  }
}
