package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalactic.Tolerance._
import org.apache.spark.sql.functions._
import graft.llm.{TextOps, SimilarityOps, MultimodalOps}

/** Behavioral tests for the LLM-pipeline operators on crafted fixtures —
  * the synthetic corpus has no real near-duplicates, so the detection
  * behavior (LSH recall, SimHash proximity, Jaccard values) is asserted
  * here on documents designed to collide. */
class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import TextOps._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"
  private def docs = Seq(
    (0L, base),
    (1L, base),                                         // exact duplicate of 0
    (2L, base + " again"),                              // near-duplicate of 0 (12/13 shingle overlap)
    (3L, "completely different content about spark catalyst optimizer internals and shuffles"),
    (4L, "short doc")
  ).toDF("doc_id", "text")

  test("embeddings reader: float/double pass through untruncated, integral widens") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val dir = java.nio.file.Files.createTempDirectory("graft_emb_norm").toString
    // double file: must NOT truncate to float — the DuckDB oracle reads
    // the same parquet at full precision and would diverge
    Seq((1L, Array(0.1d, -1.25d), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val d = graft.sources.Tables.embeddings(spark, dir)
    assert(d.schema("embedding").dataType == ArrayType(DoubleType))
    assert(d.select(col("embedding")).as[Array[Double]].head().toSeq ==
      Seq(0.1d, -1.25d))
    // integral file (defensive): widens to float
    val dir2 = java.nio.file.Files.createTempDirectory("graft_emb_int").toString
    Seq((1L, Array(1L, 2L), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")
    assert(graft.sources.Tables.embeddings(spark, dir2)
      .schema("embedding").dataType == ArrayType(FloatType))
    // the shipped float file passes through unchanged
    val native = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(native.schema("embedding").dataType == ArrayType(FloatType))
  }

  test("exact dedup: identical texts share exactKey, others do not") {
    val keys = docs.select(col("doc_id"), exactKey(col("text")).as("k"))
      .as[(Long, String)].collect().toMap
    assert(keys(0L) == keys(1L) && keys(0L) != keys(2L) && keys(0L) != keys(3L))
  }

  test("bag fingerprint is word-order insensitive") {
    val d = Seq((0L, "alpha beta gamma"), (1L, "gamma alpha beta"), (2L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val fps = d.select(col("doc_id"), bagFingerprint(tokens(col("text"))).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(0L) == fps(1L) && fps(0L) != fps(2L))
  }

  test("shingles: n=3 over k words yields k-2 shingles; short docs yield none") {
    val out = docs.select(col("doc_id"), size(shingles(tokens(col("text")), 3)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out(0L) == 12 && out(4L) == 0)
  }

  test("minhash: signature agreement estimates Jaccard; 2-row bands catch near-dups") {
    val withHs = docs.select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) >= 1)
      .select(col("doc_id"), shingleHashes(col("sh")).as("hs"))
    val sigs = (0 until 8).map(k => minhashSig(col("hs"), k).as(s"sig$k"))
    val sig = withHs.select(col("doc_id") +: sigs: _*)
    val rows = sig.collect().map(r => r.getLong(0) ->
      (1 to 8).map(r.getLong)).toMap
    def agree(a: Long, b: Long) = rows(a).zip(rows(b)).count { case (x, y) => x == y }
    assert(agree(0L, 1L) == 8)            // exact dup: all signatures equal
    // near-dup (shingle Jaccard 12/13 ≈ 0.92): most signatures agree —
    // the MinHash estimator property
    assert(agree(0L, 2L) >= 5)
    assert(agree(0L, 3L) == 0)            // unrelated: none
    // banding tradeoff: 4 bands × 2 rows has higher recall than 2 × 4 —
    // the near-dup pair must collide on at least one 2-row band
    val bands2 = (0 until 8).grouped(2).map(g =>
      bandKey(g.map(k => col(s"sig$k"))))
    val b = sig.select(col("doc_id") +: bands2.toSeq: _*).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    assert(b(0L).zip(b(2L)).exists { case (x, y) => x == y })
    assert(!b(0L).zip(b(3L)).exists { case (x, y) => x == y })
  }

  test("simhash: identical docs equal; near-dups within small hamming distance; distinct far") {
    val hashes = docs
      .select(col("doc_id"),
        simhashFromHashes(tokenHashes(tokens(col("text")))).as("h"))
      .as[(Long, String)].collect().toMap
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hashes(0L) == hashes(1L))
    assert(hamming(hashes(0L), hashes(2L)) <= 4)
    assert(hamming(hashes(0L), hashes(3L)) > 4)
  }

  test("simhash64: near-dups collide on a 16-bit band and stay within small hamming") {
    val hashes = docs
      .select(col("doc_id"),
        simhash64FromHashes(tokenHashes(tokens(col("text")))).as("h"))
      .as[(Long, String)].collect().toMap
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    def bands(h: String) = (0 until 4).map(b => h.substring(b * 16, b * 16 + 16))
    assert(hashes.values.forall(h => h.length == 64 && h.forall(c => c == '0' || c == '1')))
    assert(hashes(0L) == hashes(1L))                      // exact dup: identical fingerprint
    assert(hamming(hashes(0L), hashes(2L)) <= 8)          // near-dup: close in 64-bit space
    assert(hamming(hashes(0L), hashes(3L)) > 16)          // unrelated: far
    // the LSH recall property: the near-dup pair shares at least one band,
    // the unrelated pair shares none
    assert(bands(hashes(0L)).zip(bands(hashes(2L))).exists { case (x, y) => x == y })
    assert(!bands(hashes(0L)).zip(bands(hashes(3L))).exists { case (x, y) => x == y })
  }

  test("native SimHashBits kernel is bit-identical to the HOF formulation (16 and 64)") {
    graft.functions.NativeFunctions.register(spark)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = corpus.select(
      simhashFromHashes(tokenHashes(tokens(col("text")))).as("n16"),
      simhashFromHashesHof(tokenHashes(tokens(col("text")))).as("h16"),
      simhash64FromHashes(tokenHashes(tokens(col("text")))).as("n64"),
      simhash64FromHashesHof(tokenHashes(tokens(col("text")))).as("h64"))
      .collect()
    assert(both.nonEmpty && both.forall(r =>
      r.getString(0) == r.getString(1) && r.getString(2) == r.getString(3)))
    // SQL surface: registered function callable from spark.sql
    corpus.createOrReplaceTempView("sim_docs_v")
    val viaSql = spark.sql(
      """SELECT simhash_bits(transform(split(lower(trim(text)), '\\s+'), t -> md5(t)), 64)
        |  AS h FROM sim_docs_v LIMIT 5""".stripMargin).collect().map(_.getString(0))
    assert(viaSql.forall(h => h.length == 64 && h.forall(c => c == '0' || c == '1')))
  }

  test("native MinhashBaseHashes kernel is bit-identical to the HOF md5/conv chain") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = corpus.select(
      shingleHashes(shingles(tokens(col("text")), 3)).as("native"),
      shingleHashesHof(shingles(tokens(col("text")), 3)).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(both.nonEmpty && both.forall { case (n, h) => n == h })
    // SQL surface
    graft.functions.NativeFunctions.register(spark)
    corpus.createOrReplaceTempView("mh_docs_v")
    val viaSql = spark.sql(
      s"""SELECT minhash_base(array(text), ${graft.llm.TextOps.MinhashP}) AS h
         |FROM mh_docs_v LIMIT 3""".stripMargin)
      .collect().map(_.getSeq[Long](0))
    assert(viaSql.forall(h => h.length == 1 && h.head >= 0))
  }

  test("normalize: case/punct/space variants merge; distinct non-ASCII docs do NOT collapse") {
    // expected values cross-checked against DuckDB's RE2 evaluation of the
    // oracle pattern (identical output for every fixture below)
    val d = Seq("Maße xy", "a\u000Bb", "Héllo, Wörld!  a", "日本語 текст", "A\tB\nC")
      .toDF("text")
    val got = d.select(normalize(col("text"))).as[String].collect().toSeq
    assert(got == Seq("maße xy", "ab", "héllo wörld a", "日本語 текст", "a b c"))
    // dedup semantics: variants of one doc share a key...
    val k = Seq("Hello,  World!", "hello world", "HELLO WORLD.")
      .toDF("text").select(normalizedKey(col("text"))).as[String].collect().toSet
    assert(k.size == 1)
    // ...but distinct non-Latin documents keep DISTINCT keys (letters are
    // kept, not deleted — they must not all collapse to md5(''))
    val cjk = Seq("日本語", "中文文本", "ελληνικά")
      .toDF("text").select(normalizedKey(col("text"))).as[String].collect().toSet
    assert(cjk.size == 3)
  }

  test("winnowing: shared token run guarantees a shared fingerprint; disjoint docs share none") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (0L, s"one two $shared three"),
      (1L, s"$shared nine ten eleven"),
      (2L, "completely different words entirely here now")).toDF("doc_id", "text")
    val fps = d.select(col("doc_id"),
      winnowFingerprints(shingleHashes(shingles(tokens(col("text")), 3)), 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    // guarantee: any shared run of >= w+k-1 = 6 tokens yields a common fingerprint
    assert(fps(0L).toSet.intersect(fps(1L).toSet).nonEmpty)
    assert(fps(0L).toSet.intersect(fps(2L).toSet).isEmpty)
    // fingerprints are sorted distinct
    assert(fps.values.forall(f => f == f.distinct.sorted))
  }

  test("jaccard: permutation = 1.0; disjoint = 0.0") {
    val d = Seq((0L, "a b c"), (1L, "c b a"), (2L, "x y z")).toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("ts"))
    val j01 = d.as("l").join(d.as("r"), col("r.doc_id") === col("l.doc_id") + 1)
      .select(jaccard(col("l.ts"), col("r.ts"))).as[Double].collect()
    assert(j01(0) == 1.0 && j01(1) == 0.0)
  }

  test("langPredict picks the language with most marker hits") {
    val markers = Seq("en" -> Seq("the", "and"), "fr" -> Seq("le", "et"))
    val d = Seq((0L, "the cat and the dog"), (1L, "le chat et le chien")).toDF("doc_id", "text")
    val scores = langScores(col("text"), markers)
    val out = d.select(col("doc_id"), langPredict(scores).as("p"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "en" && out(1L) == "fr")
  }

  test("cosine: orthogonal = 0, identical = 1, works on float arrays") {
    val d = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val out = d.select(SimilarityOps.cosine(col("a"), col("b"))).as[Double].collect()
    assert(out(0) === 1.0 +- 1e-12 && out(1) === 0.0 +- 1e-12 && out(2) === 1.0 +- 1e-12)
  }

  test("native CosineSimilarity expression is bit-identical to the HOF composition") {
    graft.functions.NativeFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.as("a"); val b = e.as("b")
    val both = a.join(b, col("b.vec_id") === col("a.vec_id") + 1)
      .select(
        graft.functions.NativeFunctions.cosineSim(
          col("a.embedding"), col("b.embedding")).as("native"),
        SimilarityOps.cosine(col("a.embedding"), col("b.embedding")).as("hof"))
      .collect()
    assert(both.nonEmpty && both.forall(r => r.getDouble(0) == r.getDouble(1)))
    // SQL surface: registered function callable from spark.sql
    e.createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_v LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(viaSql.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("native hamming expression matches a reference implementation") {
    graft.functions.NativeFunctions.register(spark)
    val d = Seq(("1010", "1010"), ("1010", "0110"), ("1111", "0000"), ("10", "1011"))
      .toDF("a", "b")
    val got = d.select(graft.functions.NativeFunctions.hamming(col("a"), col("b")))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 2, 4, 2))
    // SQL surface
    d.createOrReplaceTempView("ham_v")
    assert(spark.sql("SELECT hamming(a, b) FROM ham_v").as[Int].collect().toSeq ==
      Seq(0, 2, 4, 2))
  }

  test("srpBucket: sign pattern of leading dims") {
    val d = Seq(Tuple1(Array(0.5f, -0.25f, 1.0f, -2.0f))).toDF("v")
    assert(d.select(SimilarityOps.srpBucket(col("v"), 4)).as[String].head() == "1010")
  }

  test("srpBucketAt: table t reads its own dim range; identical vectors collide in all tables") {
    val d = Seq(Tuple1(Array(0.5f, -0.25f, 1.0f, -2.0f, 0.1f, 0.2f, -0.3f, 0.4f))).toDF("v")
    assert(d.select(SimilarityOps.srpBucketAt(col("v"), 1, 4)).as[String].head() == "1010")
    assert(d.select(SimilarityOps.srpBucketAt(col("v"), 5, 4)).as[String].head() == "1101")
  }

  test("multimodal: feature extraction is deterministic and histogram covers all bytes") {
    val media = MultimodalOps.asMediaTable(docs)
      .as[MultimodalOps.MediaRecord]
    val feats = MultimodalOps.extractFeatures(media).collect().sortBy(_.id)
    assert(feats.length == 5)
    val f0 = feats.head
    assert(f0.byteLen == base.length && f0.histogram.sum == f0.byteLen)
    // deterministic: second run produces identical features
    val again = MultimodalOps.extractFeatures(media).collect().sortBy(_.id).head
    assert(again.width == f0.width && again.height == f0.height &&
      again.histogram.toSeq == f0.histogram.toSeq)
    // text payloads are byte-level fallback features, flagged undecoded
    assert(!f0.decoded && f0.width == -1 && f0.height == -1)
  }

  test("multimodal: ImageIO decodes a real PNG's true dimensions and pixel histogram") {
    // half-black / half-white 20×10 PNG generated in-process
    val img = new java.awt.image.BufferedImage(
      20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 20; y <- 0 until 10)
      img.setRGB(x, y, if (x < 10) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(MultimodalOps.MediaRecord(1L, bos.toByteArray, "image/png")).toDS()
    val f = MultimodalOps.extractFeatures(media).collect().head
    assert(f.decoded && f.width == 20 && f.height == 10)
    // luminance histogram: 100 black pixels in bin 0, 100 white in bin 15
    assert(f.histogram.sum == 200 && f.histogram(0) == 100 && f.histogram(15) == 100)
    // corrupt image payload → byte-feature fallback, flagged undecoded
    val bad = Seq(MultimodalOps.MediaRecord(2L, Array[Byte](1, 2, 3), "image/png")).toDS()
    val fb = MultimodalOps.extractFeatures(bad).collect().head
    assert(!fb.decoded && fb.width == -1 && fb.histogram.sum == 3)
  }

  test("multimodal: javax.sound decodes a real WAV's format and amplitude histogram") {
    // 16-bit PCM mono square wave at 8 kHz, 800 frames of ±16384
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val samples = Array.tabulate(800)(i => if (i % 2 == 0) 16384 else -16384)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq(MultimodalOps.MediaRecord(1L, bos.toByteArray, "audio/wav")).toDS()
    val f = MultimodalOps.extractAudioFeatures(media).collect().head
    assert(f.decoded && f.sampleRate == 8000 && f.channels == 1 && f.nFrames == 800)
    // |±16384| >> 11 = 8: every sample lands in amplitude bin 8
    assert(f.amplitudeHist(8) == 800 && f.amplitudeHist.sum == 800)
    // corrupt payload → zeros, flagged undecoded
    val bad = Seq(MultimodalOps.MediaRecord(2L, Array[Byte](9, 9), "audio/wav")).toDS()
    val fb = MultimodalOps.extractAudioFeatures(bad).collect().head
    assert(!fb.decoded && fb.sampleRate == 0 && fb.amplitudeHist.sum == 0)
  }

  test("multimodal: MP4 box walk parses container dims/duration without a codec") {
    // minimal ISO BMFF file generated in-process:
    // ftyp + moov( mvhd[timescale=600,duration=3000] + trak(tkhd[640×360]) )
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    def u32(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    val mvhd = box("mvhd", new Array[Byte](12) ++ // v0+flags, creation, modification
      u32(600L) ++ u32(3000L) ++                  // timescale, duration → 5000 ms
      new Array[Byte](80))                        // rate..next_track_ID
    val tkhd = box("tkhd", new Array[Byte](76) ++ // v0 header through the matrix
      u32(640L << 16) ++ u32(360L << 16))         // 16.16 fixed width/height
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](4)) ++
      box("moov", mvhd ++ box("trak", tkhd))
    val media = Seq(MultimodalOps.MediaRecord(1L, mp4, "video/mp4")).toDS()
    val f = MultimodalOps.extractVideoFeatures(media).collect().head
    assert(f.decoded && f.metadataOnly, "container metadata must parse, pixels must not claim to")
    assert(f.width == 640 && f.height == 360 && f.durationMs == 5000L && f.nTracks == 1)
    // corrupt payload and a non-video mime both quarantine, not fake dims
    val bad = Seq(
      MultimodalOps.MediaRecord(2L, Array[Byte](0, 0, 0, 9, 'j', 'u', 'n', 'k', 1), "video/mp4"),
      MultimodalOps.MediaRecord(3L, mp4, "text/plain")).toDS()
    val fb = MultimodalOps.extractVideoFeatures(bad).collect().sortBy(_.id)
    assert(fb.forall(x => !x.decoded && x.width == 0 && x.durationMs == 0L))
  }

  test("resizeDims: aspect-preserving, no upscale; non-positive dims give NULL struct") {
    val d = Seq((2000, 1000), (100, 50), (0, 100), (100, -1)).toDF("w", "h")
    val out = d.select(MultimodalOps.resizeDims(col("w"), col("h"), 512, 512).as("r"))
      .selectExpr("r.out_w", "r.out_h", "r.scale", "r IS NULL AS is_null").collect()
    assert(out(0).getInt(0) == 512 && out(0).getInt(1) == 256)   // downscale 2:1 box fit
    assert(out(1).getInt(0) == 100 && out(1).getInt(1) == 50 &&
      out(1).getDouble(2) == 1.0)                                // no upscale
    assert(out(2).getBoolean(3) && out(3).getBoolean(3))         // invalid dims → NULL
  }

  test("native JaccardCounts kernel matches the array_intersect/array_union built-ins") {
    graft.functions.NativeFunctions.register(spark)
    val d = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("b", "b", "a")),   // duplicates collapse
      (Seq("x"), Seq("y")),                       // disjoint
      (Seq.empty[String], Seq("a")),              // empty side
      (Seq.empty[String], Seq.empty[String]))     // both empty → union 0
      .toDF("a", "b")
    val out = d.select(
      graft.functions.NativeFunctions.jaccardCounts(col("a"), col("b")).as("jc"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ec"),
      size(array_union(col("a"), col("b"))).cast("long").as("eu"))
      .selectExpr("jc.n_common", "jc.n_union", "ec", "eu").collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3), r.toString)
    }
  }

  test("LSH geometry knobs: fewer bands/tables give a candidate subset; invalid tiling rejected") {
    import graft.queries.LlmQueries
    val dir = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
      df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall is monotone in band count: every first-band-matched pair of
    // the narrow config also collides in the wide one
    val sim2 = pairs(LlmQueries.simhash64Pairs(spark, dir, 16, 2), "doc_a", "doc_b")
    val sim4 = pairs(LlmQueries.simhash64Pairs(spark, dir, 16, 4), "doc_a", "doc_b")
    assert(sim2.subsetOf(sim4) && sim4.nonEmpty)
    val srp2 = pairs(LlmQueries.mtSrpPairs(spark, dir, 16, 2), "vec_a", "vec_b")
    val srp4 = pairs(LlmQueries.mtSrpPairs(spark, dir, 16, 4), "vec_a", "vec_b")
    assert(srp2.subsetOf(srp4))
    // config plumbing: dedup.* keys reach the operators
    val cfg = graft.util.PipelineConfig.parse(Seq(
      "dedup:", "  simhash_band_bits: 32", "  simhash_bands: 2"))
    assert(pairs(LlmQueries.simhash64PairsFromConfig(spark, dir, cfg), "doc_a", "doc_b")
      .subsetOf(sim4)) // 2×32-bit bands are strictly finer than 4×16
    intercept[IllegalArgumentException] {
      LlmQueries.simhash64Pairs(spark, dir, 32, 4) // 128 bits > 64
    }
  }

  test("redactPii: tags every category, counts on the ORIGINAL text, " +
    "email-embedded addresses redact whole") {
    import graft.llm.TextOps
    val df = Seq(
      (1L, "mail a.b+c@sub.example.org or x@y.io now"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call 555-123-4567 or 555.987.6543"),
      (4L, "user@1.2.3.4 logged in"), // numeric host: not an email match
      (5L, "no pii here 12.34 and 1234-5678")
    ).toDF("doc_id", "text")
    val r = TextOps.redactPii(df).orderBy("doc_id")
      .select("redacted", "n_email", "n_ip", "n_phone")
      .collect()
    assert(r(0).getString(0) == "mail <EMAIL> or <EMAIL> now")
    assert(r(0).getLong(1) == 2 && r(0).getLong(2) == 0)
    assert(r(1).getString(0) == "server <IP> and <IP> up")
    assert(r(1).getLong(2) == 2)
    assert(r(2).getString(0) == "call <PHONE> or <PHONE>")
    assert(r(2).getLong(3) == 2)
    // an all-numeric host is NOT an email by the pattern (no
    // alphabetic TLD) — the embedded IPv4 is what gets tagged, in both
    // engines identically
    assert(r(3).getString(0) == "user@<IP> logged in")
    assert(r(3).getLong(1) == 0 && r(3).getLong(2) == 1)
    assert(r(4).getString(0) == "no pii here 12.34 and 1234-5678")
    assert(r(4).getLong(1) == 0 && r(4).getLong(2) == 0 &&
      r(4).getLong(3) == 0)
  }
}
