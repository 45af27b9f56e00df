package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t
import graft.ops.RelationalOps.rnd
import graft.llm.{TextOps, SimilarityOps, MultimodalOps}

/** LLM-training-data pipeline operators registered as verifiable queries
  * over `documents` / `embeddings` (builder-prompt extension scope):
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
  * cosine), similarity search (brute-force + LSH-bucketed ANN), text
  * analysis (lang-ID, quality, token counts, fingerprints), multimodal
  * binary-column plumbing.
  */
object LlmQueries {
  import TextOps._
  import SimilarityOps._

  /** functions.size under a non-shadowable name — chunkTokens takes a
    * `size` parameter. */
  private def size_(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.size(c)

  val stopwords = Seq("the", "a", "of", "and", "to", "in")
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to"),
    "de" -> Seq("der", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "de", "que", "los"))

  /** doc_id + 8 minhash signatures + 2 LSH bands, as a PURE MAP (no
    * explode, no shuffle — see TextOps.minhashSig). Docs with <1 shingle
    * (under 3 words) are excluded, matching the explode→groupBy semantics. */
  private def minhashSignatures(docs: DataFrame): DataFrame = {
    // Materialize the per-shingle base hashes BEFORE deriving signatures:
    // CollapseProject would otherwise inline the md5-transform tree into
    // all 8 signature expressions and again into both band keys (~12
    // copies, recomputed at execution AND re-walked by the single-threaded
    // optimizer — measured 8s/call at sf0.1). After the barrier the
    // signatures are cheap integer folds over the cached hash arrays. At
    // 100 TB this barrier is "write the signature table to storage" — the
    // standard break in a production dedup pipeline.
    val withHs = spreadSmallInput(docs)
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) >= 1)
      .select(col("doc_id"), shingleHashes(col("sh")).as("hs"))
      // LAZY: every consumer's first action is a single-branch scan
      // (the signature-table checkpoint or the caller's aggregate), so
      // the hash table materializes inside that job instead of paying
      // a dedicated checkpoint job
      .localCheckpoint(false)
    val sigs = (0 until 8).map(k => minhashSig(col("hs"), k).as(s"sig$k"))
    withHs.select(col("doc_id") +: sigs: _*)
      .withColumn("band0", bandKey((0 to 3).map(k => col(s"sig$k"))))
      .withColumn("band1", bandKey((4 to 7).map(k => col(s"sig$k"))))
  }

  /** Minhash-LSH candidate pairs (unordered output; callers sort).
    *
    * localCheckpoint truncates the logical lineage: the self-join would
    * otherwise duplicate the whole lambda-heavy signature subtree into
    * both join branches and the single-threaded optimizer/codegen pass
    * dominates wall time (measured: ~20s plan work for <1s of execution).
    * Checkpointing materializes the narrow signature table once and both
    * branches reference the materialized RDD — the production dedup
    * pattern (compute signatures once, join twice).
    *
    * Each pair is emitted by its FIRST matching band (band 1's join
    * requires band 0 to differ), so the union needs no
    * DISTINCT-over-candidates shuffle — the same residual-predicate
    * pattern as simhash64Pairs/mtSrpPairs; at corpus scale the distinct
    * would re-shuffle every candidate pair. */
  /** The 3-batch incremental-ingest corpus: per batch a fresh slice of
    * `documents` plus deterministic duplicate injections — cross-batch
    * exact copies (+10000/+30000/+40000 ids), intra-batch exact copies
    * (+20000), and a MUTATED near-copy class (+40000: text with an
    * appended tail — distinct exact hash, mostly-shared shingles).
    * Shared by q_dedup_incremental (exact) and
    * q_dedup_incremental_lsh; the oracles replay the identical
    * construction. */
  private def ingestBatches(s: SparkSession, dir: String): Seq[DataFrame] = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)
    val b1 = d.filter(col("doc_id") % 3 === 0)
    val b2 = d.filter(col("doc_id") % 3 === 1)
      .union(d.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      .union(d.filter(col("doc_id") % 3 === 1 && col("doc_id") % 5 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
    val b3 = d.filter(col("doc_id") % 3 === 2)
      .union(d.filter(col("doc_id") % 3 === 1 && col("doc_id") % 7 === 0)
        .select((col("doc_id") + 30000).as("doc_id"), col("text")))
      .union(d.filter(col("doc_id") % 12 === 0)
        .select((col("doc_id") + 40000).as("doc_id"),
          concat(col("text"), lit(" appended tail")).as("text")))
    Seq(b1, b2, b3)
  }

  private def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(t(s, dir, "documents")).localCheckpoint()
    val a = sig.as("a"); val b = sig.as("b")
    val perBand = Seq(
      col("a.band0") === col("b.band0"),
      col("a.band1") === col("b.band1") && col("a.band0") =!= col("b.band0"))
      .map(cond => a.join(b, cond && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")))
    perBand.reduce(_.union(_))
  }

  /** Banded 64-bit simhash near-dup pairs — the corpus-scale text dedup.
    * Candidates share at least one `bandBits`-bit band of `nBands`; the
    * exact filter is the codegen'd 64-bit hamming. Each pair is generated
    * by its FIRST matching band only — band k's join carries the residual
    * predicate "bands 0..k-1 differ" — so no post-join DISTINCT-over-
    * candidates shuffle exists; at 100 TB that distinct would re-shuffle
    * every candidate pair. The checkpointed `h` is the materialized
    * fingerprint table a production pipeline persists before the joins.
    *
    * Geometry is the scale knob (dedup.simhash_band_bits /
    * dedup.simhash_bands in pipeline config): bits ≈ log2(n)+slack keeps
    * expected bucket occupancy O(slack) — 16-bit bands for the test
    * corpus, 32-bit at n = 10⁹ (NOTES.md candidate-pair budget table). */
  def simhash64Pairs(s: SparkSession, dir: String,
                     bandBits: Int, nBands: Int, maxHamming: Int = 8): DataFrame = {
    require(bandBits > 0 && nBands > 0 && bandBits * nBands <= 64,
      s"band geometry must tile ≤64 fingerprint bits, got $nBands×$bandBits")
    graft.functions.NativeFunctions.register(s)
    val bandCols = (0 until nBands).map(bd =>
      substring(col("sh"), bd * bandBits + 1, bandBits).as(s"b$bd"))
    val h = spreadSmallInput(t(s, dir, "documents"))
      .select(col("doc_id"),
        simhash64FromHashes(tokenHashes(tokens(col("text")))).as("sh"))
      .select(col("doc_id") +: col("sh") +: bandCols: _*)
      .localCheckpoint()
    val perBand = (0 until nBands).map { bd =>
      val a = h.as("a"); val b = h.as("b")
      val firstMatch = (0 until bd).map(e => col(s"a.b$e") =!= col(s"b.b$e"))
        .foldLeft(col(s"a.b$bd") === col(s"b.b$bd"))(_ && _)
      a.join(b, firstMatch && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          graft.functions.NativeFunctions.hamming(
            col("a.sh"), col("b.sh")).as("hamming_dist"))
    }
    perBand.reduce(_.union(_))
      .filter(col("hamming_dist") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Multi-table SRP embedding near-dup — the corpus-scale embedding
    * dedup: `nTables` independent `tableBits`-bit hash tables over
    * consecutive dimension ranges; a pair is a candidate if it collides
    * in ANY table (OR-amplification: tables recover the recall one wide
    * hash loses, while 2^bits buckets cap the per-bucket pair blowup).
    * First-colliding-table residuals replace the DISTINCT shuffle, as in
    * [[simhash64Pairs]]. Geometry knobs: dedup.srp_table_bits /
    * dedup.srp_tables. */
  def mtSrpPairs(s: SparkSession, dir: String,
                 tableBits: Int, nTables: Int, minCos: Double = 0.0): DataFrame = {
    require(tableBits > 0 && nTables > 0 && tableBits * nTables <= 64,
      s"table geometry must tile ≤64 dims, got $nTables×$tableBits")
    graft.functions.NativeFunctions.register(s)
    val bucketCols = (0 until nTables).map(tb =>
      srpBucketAt(col("embedding"), tb * tableBits + 1, tableBits).as(s"t$tb"))
    val e = graft.sources.Tables.embeddings(s, dir)
      .select(col("vec_id") +: col("embedding") +: bucketCols: _*)
      .localCheckpoint()
    val perTable = (0 until nTables).map { tb =>
      val a = e.as("a"); val b = e.as("b")
      val firstMatch = (0 until tb).map(x => col(s"a.t$x") =!= col(s"b.t$x"))
        .foldLeft(col(s"a.t$tb") === col(s"b.t$tb"))(_ && _)
      a.join(b, firstMatch && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          graft.functions.NativeFunctions.cosineSim(
            col("a.embedding"), col("b.embedding")).as("cos_sim"))
    }
    perTable.reduce(_.union(_))
      .filter(col("cos_sim") > minCos)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Config-driven geometry (configs/pipeline_config.yml `dedup:`
    * section; defaults = the oracle-pinned 16-bit/4-table demo). */
  def simhash64PairsFromConfig(s: SparkSession, dir: String,
                               cfg: graft.util.PipelineConfig): DataFrame =
    simhash64Pairs(s, dir,
      cfg.int("dedup.simhash_band_bits", 16), cfg.int("dedup.simhash_bands", 4))

  def mtSrpPairsFromConfig(s: SparkSession, dir: String,
                           cfg: graft.util.PipelineConfig): DataFrame =
    mtSrpPairs(s, dir,
      cfg.int("dedup.srp_table_bits", 16), cfg.int("dedup.srp_tables", 4))

  /** Overlapping token chunks of `size` tokens every `stride` tokens
    * (RAG ingestion shape). Pure map + explode — chunk count is integer
    * arithmetic on the token count, chunks are array slices; no shuffle
    * beyond the output sort. */
  def chunkTokens(s: SparkSession, dir: String, size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride,
      s"chunk geometry must satisfy 0 < stride <= size, got size=$size stride=$stride")
    val d = t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("n", size_(col("tk")).cast("long"))
    d.select(col("doc_id"), col("tk"),
        explode(sequence(lit(0L),
          when(col("n") <= size, lit(0L))
            .otherwise(floor((col("n") - lit((size - stride + 1).toLong))
              / lit(stride.toLong)).cast("long"))))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("tk"), (col("chunk_id") * stride + 1).cast("int"), lit(size)).as("ck"))
      .select(col("doc_id"), col("chunk_id"),
        size_(col("ck")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("ck"))).as("chunk_key"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  def chunkFromConfig(s: SparkSession, dir: String,
                      cfg: graft.util.PipelineConfig): DataFrame =
    chunkTokens(s, dir,
      cfg.int("chunk.size_tokens", 40), cfg.int("chunk.stride_tokens", 30))

  /** Training-sequence packing via a DISTRIBUTED prefix sum: per-bucket
    * window cumsums run in parallel, then each bucket adds a running
    * offset computed from the tiny bucket-totals table (the textbook
    * two-pass parallel scan). A single global-order window would
    * serialize the whole corpus through one partition; this shape keeps
    * one row per BUCKET in the serial step — pick `bucketW` so that
    * table stays driver-small (10⁶ docs/bucket → 10⁵ offset rows at
    * 10¹¹ docs). Integer addition is associative, so the bucketed sum is
    * bit-identical to the oracle's global scan. */
  def packSequences(s: SparkSession, dir: String, cap: Long, bucketW: Long): DataFrame =
    packSequencesOf(t(s, dir, "documents"), cap, bucketW)

  /** doc_id, n_tokens and the cumulative token count via the DISTRIBUTED
    * two-pass prefix sum (see [[packSequencesOf]] scaladoc): per-bucket
    * window cumsums in parallel + a tiny serial offset scan over bucket
    * totals. Shared by whole-doc packing and boundary-split packing. */
  private def cumTokens(docs: DataFrame, bucketW: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs
      .select(col("doc_id"), size_(tokens(col("text"))).cast("long").as("n_tokens"),
        floor(col("doc_id") / lit(bucketW)).cast("long").as("bkt"))
    val wLocal = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = d.withColumn("local_cum", sum(col("n_tokens")).over(wLocal))
    val wOff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("btot"))
      .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
      .select(col("bkt"), col("off"))
    local.join(broadcast(offsets), Seq("bkt"))
      .withColumn("cum", col("local_cum") + col("off"))
      .select(col("doc_id"), col("n_tokens"), col("cum"))
  }

  /** [[packSequences]] over an arbitrary (doc_id, text) frame — the gold
    * layer of [[graft.layers.TextMedallion]] packs the SILVER corpus. */
  def packSequencesOf(docs: DataFrame, cap: Long, bucketW: Long): DataFrame = {
    require(cap > 0 && bucketW > 0,
      s"pack geometry must be positive, got cap=$cap bucketW=$bucketW")
    cumTokens(docs, bucketW)
      .withColumn("seq_id",
        floor((col("cum") - col("n_tokens")) / lit(cap)).cast("long"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"),
        max(col("cum")).as("cum_end"))
      .withColumn("spill",
        greatest(col("cum_end") - (col("seq_id") + 1) * cap, lit(0L)))
      .drop("cum_end")
      .orderBy(col("seq_id"))
  }

  /** Boundary-SPLIT packing — the production trainer layout: documents
    * split exactly at sequence boundaries, so every sequence holds
    * exactly `cap` tokens (except the last). Each doc's fragment set is
    * CLOSED-FORM from its prefix-sum interval [cum−n, cum): it overlaps
    * bins first=⌊(cum−n)/cap⌋ .. last=⌊(cum−1)/cap⌋, and the overlap
    * with bin k is [max(0, k·cap−(cum−n)), min(n, (k+1)·cap−(cum−n))) —
    * one explode over that bin range, no shuffle beyond the prefix sum
    * already paid. */
  def packFragmentsOf(docs: DataFrame, cap: Long, bucketW: Long): DataFrame = {
    require(cap > 0 && bucketW > 0,
      s"pack geometry must be positive, got cap=$cap bucketW=$bucketW")
    cumTokens(docs, bucketW)
      .filter(col("n_tokens") > 0)
      .withColumn("start0", col("cum") - col("n_tokens"))
      .withColumn("seq_id", explode(sequence(
        floor(col("start0") / lit(cap)).cast("long"),
        floor((col("cum") - 1) / lit(cap)).cast("long"))))
      .withColumn("tok_start",
        greatest(lit(0L), col("seq_id") * cap - col("start0")))
      .withColumn("tok_end",
        least(col("n_tokens"), (col("seq_id") + 1) * cap - col("start0")))
      .select(col("seq_id"), col("doc_id"), col("tok_start"),
        (col("tok_end") - col("tok_start")).as("frag_tokens"))
      .orderBy(col("seq_id"), col("doc_id"))
  }

  def packFromConfig(s: SparkSession, dir: String,
                     cfg: graft.util.PipelineConfig): DataFrame =
    packSequences(s, dir,
      cfg.int("pack.seq_tokens", 512).toLong, cfg.int("pack.bucket_docs", 100).toLong)

  /** (doc_id, seg_id, seg): every document cut into fixed `segW`-token
    * spans — derived narrowly from the scan (tokenize, explode, slice),
    * no shuffle. Consumers re-derive it per pass: a re-scan is map work;
    * shipping segment text through an exchange is what doesn't survive
    * 100 TB. */
  private def segmentTable(s: SparkSession, dir: String, segW: Int): DataFrame =
    spreadSmallInput(t(s, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(0L),
          floor((size_(col("tk")) - 1) / lit(segW)).cast("long"))).as("seg_id"))
      .select(col("doc_id"), col("seg_id"),
        concat_ws(" ",
          slice(col("tk"), (col("seg_id") * segW + 1).cast("int"), lit(segW))).as("seg"))

  /** Segment-level global dedup on fixed `segW`-token spans (Lee et al.
    * 2022 §4, the bounded-memory segment-grid form): PRODUCTION output —
    * the text-free (doc_id, seg_id) drop list a writer anti-joins when
    * materializing the cleaned corpus. The first occurrence of each
    * distinct segment wins, elected by min(struct(doc_id, seg_id)) —
    * a genuine lexicographic arg-min, not a packed-integer key, so any
    * per-document segment count and any doc_id range are safe. The only
    * corpus-derived exchange carries (md5, doc_id, seg_id) — segment
    * text NEVER shuffles (CorpusOpsSpec asserts no text attribute on any
    * exchange in the optimized plan). */
  def segmentDropList(s: SparkSession, dir: String, segW: Int): DataFrame = {
    require(segW > 0, s"segment width must be positive, got $segW")
    val keyed = segmentTable(s, dir, segW)
      .select(md5(col("seg")).as("seg_key"), col("doc_id"), col("seg_id"))
    val winners = keyed.groupBy(col("seg_key"))
      .agg(min(struct(col("doc_id"), col("seg_id"))).as("win"))
    keyed.join(winners, Seq("seg_key"))
      .filter(struct(col("doc_id"), col("seg_id")) =!= col("win"))
      .select(col("doc_id"), col("seg_id"))
  }

  /** Fixture/verification path over [[segmentDropList]]: rebuild each
    * document's kept text and summarize (count, md5, length) per doc.
    * The rebuild's collect_list ships kept segment text through one
    * linear exchange — acceptable for verifying the drop-list semantics
    * on fixtures, but production writers consume [[segmentDropList]]
    * directly. */
  def dedupSegments(s: SparkSession, dir: String, segW: Int): DataFrame = {
    val segs = segmentTable(s, dir, segW)
    val rebuilt = segs
      .join(segmentDropList(s, dir, segW), Seq("doc_id", "seg_id"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg_id"), col("seg")))),
          x => x.getField("seg")), " ").as("kept_text"))
    t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        (floor((size_(col("tk")) - 1) / lit(segW)) + 1).cast("long").as("n_segs"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("kept_text"), lit(""))).as("kept_key"),
        length(coalesce(col("kept_text"), lit(""))).cast("long").as("kept_len"))
      .orderBy(col("doc_id"))
  }

  def dedupSegmentsFromConfig(s: SparkSession, dir: String,
                              cfg: graft.util.PipelineConfig): DataFrame =
    segmentDropList(s, dir, cfg.int("segdedup.segment_tokens", 10))

  /** Merge flagged window start positions into maximal [start, end)
    * token spans per document (touching windows coalesce) — one
    * doc_id-partitioned gaps-and-islands window over the (small) flagged
    * set; output (doc_id, span_start, span_end, n_windows).
    * private[graft]: property-tested directly (CorpusOpsSpec). */
  private[graft] def mergeSpans(flagged: DataFrame, L: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    flagged
      .withColumn("prev_end", max(col("pos") + L)
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        when(col("prev_end").isNull || col("pos") > col("prev_end"), 1L)
          .otherwise(0L))
      .withColumn("span", sum(col("new_span")).over(byDoc))
      .groupBy(col("doc_id"), col("span"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + L).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_windows"))
  }

  /** Exact-substring dedup over SLIDING `L`-token windows — the
    * full-recall form of [[segmentDropList]]'s aligned grid. A duplicated
    * run of ≥ L tokens at ANY alignment is, at every offset, an L-window
    * seen elsewhere, so every such run is caught and its maximal extent
    * recovered exactly (the grid needs an aligned cell inside the run:
    * recall (s−W+1)/W for a run of s tokens, 1 only from s ≥ 2W−1 —
    * NOTES.md "exact-substring recall"). This is the detection guarantee
    * of Lee et al. 2022's suffix array, bought with n windows instead of
    * O(n log n) global sorts. Output: merged maximal drop spans (doc_id,
    * span_start, span_end token-exclusive, n_windows), first occurrence
    * (min struct(doc_id, pos)) kept corpus-wide.
    *
    * Two-phase window keying: phase 1 keys ALL windows with the codegen'd rolling
    * Rabin–Karp kernel ([[graft.functions.RollingHashWindows]] — each
    * token hashed once, O(1) roll per window, an 8-byte key on the wire
    * instead of a 32-char hex md5); phase 2 re-derives md5 keys ONLY for
    * windows whose rolling hash repeats (equal windows always collide, so
    * recall is exact) and elects winners on those, so a structured 64-bit
    * collision can never false-drop a span — the O(n·L) digest cost
    * shrinks to the corpus's duplicated fraction. The candidate position
    * list rides a broadcast back onto the token arrays (positions only —
    * no text shuffles; at corpus scale the same join runs exchange-free
    * against doc_id-bucketed storage). */
  def dupSpanDropList(s: SparkSession, dir: String, L: Int): DataFrame = {
    require(L > 0, s"window width must be positive, got $L")
    import org.apache.spark.sql.graft.NativeColumns
    val docs = spreadSmallInput(t(s, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    val wins = docs
      .select(col("doc_id"), posexplode(NativeColumns.rollingHash(col("tk"), L)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("rh"))
    // map-side partial agg beats a count-over-window here: a stopword-run
    // window repeated millions of times would pile onto one reducer
    val dupKeys = wins.groupBy(col("rh"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).select(col("rh"))
    val candByDoc = wins.join(dupKeys, Seq("rh"))
      .groupBy(col("doc_id")).agg(collect_list(col("pos")).as("cand_pos"))
    val verify = docs.join(broadcast(candByDoc), Seq("doc_id"))
      .select(col("doc_id"), explode(col("cand_pos")).as("pos"), col("tk"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ",
          slice(col("tk"), (col("pos") + 1).cast("int"), lit(L)))).as("wkey"))
    val winners = verify.groupBy(col("wkey"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("win"))
    val losers = verify.join(winners, Seq("wkey"))
      .filter(struct(col("doc_id"), col("pos")) =!= col("win"))
      .select(col("doc_id"), col("pos"))
    mergeSpans(losers, L)
  }

  /** SPAN-LEVEL eval-set decontamination: where [[queries]]'
    * q_decontaminate flags whole documents by n-gram overlap rate, this
    * reports the exact [start, end) token spans that match the held-out
    * benchmark (every 50th doc, the fixture role) — the artifact for
    * SURGICAL removal, which keeps the rest of a long document instead
    * of dropping it (the PaLM/C4 contamination treatment).
    *
    * Same two-phase keying as [[dupSpanDropList]]: the corpus side keys
    * ALL its windows with the O(n) rolling kernel and semi-joins the
    * BROADCAST benchmark rolling-key set (no false negatives — equal
    * windows share a key), then re-derives md5 keys for the HIT
    * positions only and exact-verifies them against the benchmark's md5
    * window set, so a 64-bit collision can never flag a clean span. The
    * corpus never builds window strings except for candidates and never
    * shuffles for the membership test; both benchmark key sets are tiny
    * (broadcast); only matched positions regroup for the span merge. */
  def decontaminateSpans(s: SparkSession, dir: String, L: Int): DataFrame = {
    require(L > 0, s"window width must be positive, got $L")
    import org.apache.spark.sql.graft.NativeColumns
    val docs = t(s, dir, "documents")
    val bench = spreadSmallInput(docs.filter(col("doc_id") % 50 === 0))
      .select(tokens(col("text")).as("tk"))
    val benchRh = bench
      .select(explode(NativeColumns.rollingHash(col("tk"), L)).as("rh")).distinct()
    val benchKeys = bench
      .select(explode(TextOps.shingles(col("tk"), L)).as("w"))
      .select(md5(col("w")).as("wkey")).distinct()
    val corpus = spreadSmallInput(docs.filter(col("doc_id") % 50 =!= 0))
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    val cand = corpus
      .select(col("doc_id"), posexplode(NativeColumns.rollingHash(col("tk"), L)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("rh"))
      .join(broadcast(benchRh), Seq("rh"), "left_semi")
    val candByDoc = cand.groupBy(col("doc_id"))
      .agg(collect_list(col("pos")).as("cand_pos"))
    val hits = corpus.join(broadcast(candByDoc), Seq("doc_id"))
      .select(col("doc_id"), explode(col("cand_pos")).as("pos"), col("tk"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ",
          slice(col("tk"), (col("pos") + 1).cast("int"), lit(L)))).as("wkey"))
      .join(broadcast(benchKeys), Seq("wkey"), "left_semi")
      .select(col("doc_id"), col("pos"))
    mergeSpans(hits, L)
  }

  /** Per-document pipeline decision — exact-dup election first, then the
    * quality/lang filter (first failing rule wins): the single source of
    * truth for [[graft.layers.TextMedallion]]'s silver layer and the
    * verified q_text_pipeline registry query. The dup election is a
    * groupBy+join on the md5 key (hashes shuffle, text never), same
    * shape as q_dedup_exact. */
  /** First-failing-rule quality/lang reason over (text, lang) — shared
    * by the batch [[docDecisions]] election, the q_doc_filter query and
    * the streaming silver ingestion (pure row expression: usable in
    * append-mode streams where the dup election becomes dedup STATE). */
  def filterReason: org.apache.spark.sql.Column = {
    val f = qualityFeatures(col("text"), stopwords)
    when(f("n_tokens") < 5, "too_short")
      .when(f("distinct_ratio") < 0.3, "repetitive")
      .when(f("stopword_ratio") > 0.5, "boilerplate")
      .when(langPredict(langScores(col("text"), langMarkers)) =!= col("lang"),
        "lang_mismatch")
      .otherwise("keep")
  }

  def docDecisions(docs: DataFrame): DataFrame = {
    val keyed = docs.withColumn("_k", exactKey(col("text")))
    val winners = keyed.groupBy(col("_k")).agg(min(col("doc_id")).as("_keep"))
    val reason = filterReason
    keyed.join(winners, Seq("_k"))
      .withColumn("status",
        when(col("doc_id") =!= col("_keep"), "dup")
          .when(reason =!= "keep", reason)
          .otherwise("silver"))
      .withColumn("in_silver", col("status") === "silver")
      .withColumn("n_tokens",
        qualityFeatures(col("text"), stopwords)("n_tokens"))
      .drop("_k", "_keep")
  }

  /** IVF-style ANN: coarse quantizer TRAINED by spherical k-means (fixed
    * deterministic Lloyd rounds, init = first k vectors — KMeans.scala),
    * each vector assigned to its nearest centroid (inverted lists), the
    * query probes its nprobe best lists only. At scale: centroids
    * broadcast, lists written partitioned by cent_id (IvfIndex) → a probe
    * reads nprobe partitions instead of the whole corpus. Knobs via the
    * `ann:` config section; k grows ~√corpus, nprobe sets the
    * recall/latency trade. */
  def annIvf(s: SparkSession, dir: String,
             k: Int, lloydRounds: Int, nprobe: Int): DataFrame = {
    graft.functions.NativeFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    val cos = graft.functions.NativeFunctions.cosineSim _
    val e = graft.sources.Tables.embeddings(s, dir)
    val cents = graft.llm.KMeans.train(e, k, lloydRounds)
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("cos_c", cos(col("embedding"), col("cvec")))
      .persist()
    val ivf = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    val probes = scored.filter(col("vec_id") === 0L)
      .orderBy(col("cos_c").desc, col("cent_id")).limit(nprobe)
      .select(col("cent_id"))
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    ivf.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cent_id"), cos(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  /** IVF ANN through the PRODUCTION init path: kmeans|| oversampling
    * (KMeans.trainParallel — deterministic md5 coins, driver-side only
    * the O(k log n) candidate reduction) instead of the oracle-replayable
    * first-k init. The trained quantizer is not expressible as one SQL
    * text, so the registry query probes ALL `k` lists: the inverted
    * lists partition the corpus exactly once, so a full probe must
    * equal brute-force top-5 REGARDLESS of where training converged —
    * an invariant DuckDB can check (and a real index-correctness
    * property: any list dropped, duplicated or mis-scored breaks it).
    * The recall/pruning behavior of a partial probe through this init is
    * spec-asserted instead (IvfSpec "kmeans|| quantizer"). */
  def annIvfKmpp(s: SparkSession, dir: String,
                 k: Int, lloydRounds: Int, l: Int, rounds: Int): DataFrame = {
    graft.functions.NativeFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    val cos = graft.functions.NativeFunctions.cosineSim _
    val e = graft.sources.Tables.embeddings(s, dir)
    val cents = graft.llm.KMeans.trainParallel(e, k, lloydRounds, l, rounds)
    val ivf = e.crossJoin(broadcast(cents))
      .withColumn("cos_c", cos(col("embedding"), col("cvec")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    ivf.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), cos(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  /** Product-quantized ANN (PqOps): `m` subspace codebooks of `k`
    * codewords trained by fixed-point Lloyd rounds, corpus encoded to m
    * codes/vector, query scored by ADC lookup-table parts summed in
    * subspace order. Completes the ANN family: brute force (exact) /
    * LSH + IVF (candidate pruning) / SQ8 (bandwidth) / PQ (memory). */
  def annPq(s: SparkSession, dir: String,
            m: Int, k: Int, lloydRounds: Int): DataFrame = {
    graft.functions.NativeFunctions.register(s)
    require(64 % m == 0, s"subspace count must tile 64 dims, got $m")
    val subDim = 64 / m
    val e = graft.sources.Tables.embeddings(s, dir)
    val books = graft.llm.PqOps.trainCodebooks(e, m, subDim, k, lloydRounds)
    val codes = graft.llm.PqOps.encode(e, books, m, subDim)
    graft.llm.PqOps.adcScores(codes, books, e.filter(col("vec_id") === 0L), m, subDim)
      .filter(col("vec_id") =!= 0L)
      .orderBy(col("approx_dot").desc, col("vec_id"))
      .limit(10)
  }

  /** IVF-PQ composition (the FAISS IVFPQ layout, minus residual
    * encoding): probe the coarse-quantizer lists, then ADC-score ONLY
    * the probed lists' PQ code rows. At 100 TB the code table is
    * written partitioned by cent_id like the IVF index, so a query
    * reads nprobe partitions of a 16×-compressed table — probe cost is
    * corpus · nprobe/centroids ÷ 16 versus brute force; the raw vectors
    * are touched only by the final exact re-rank (not shown here). */
  def annIvfPq(s: SparkSession, dir: String, k: Int, lloydRounds: Int,
               nprobe: Int, m: Int, pqK: Int): DataFrame = {
    graft.functions.NativeFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    val cos = graft.functions.NativeFunctions.cosineSim _
    require(64 % m == 0, s"subspace count must tile 64 dims, got $m")
    val subDim = 64 / m
    val e = graft.sources.Tables.embeddings(s, dir)
    val cents = graft.llm.KMeans.train(e, k, lloydRounds)
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("cos_c", cos(col("embedding"), col("cvec")))
      .persist()
    val ivf = scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id"))
    val probes = scored.filter(col("vec_id") === 0L)
      .orderBy(col("cos_c").desc, col("cent_id")).limit(nprobe)
      .select(col("cent_id"))
    val pv = ivf.join(broadcast(probes), Seq("cent_id"))
    val books = graft.llm.PqOps.trainCodebooks(e, m, subDim, pqK, lloydRounds)
    val codes = graft.llm.PqOps.encode(e, books, m, subDim)
    val probedCodes = codes.join(pv.select("vec_id"), Seq("vec_id"))
    graft.llm.PqOps.adcScores(probedCodes, books, e.filter(col("vec_id") === 0L), m, subDim)
      .join(pv, Seq("vec_id"))
      .filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), col("cent_id"), col("approx_dot"))
      .orderBy(col("approx_dot").desc, col("vec_id"))
      .limit(10)
  }

  /** Config-driven ANN variants (`ann:` section; defaults = the
    * oracle-pinned demo geometry). */
  def annIvfFromConfig(s: SparkSession, dir: String,
                       cfg: graft.util.PipelineConfig): DataFrame =
    annIvf(s, dir, cfg.int("ann.ivf_centroids", 16),
      cfg.int("ann.lloyd_rounds", 2), cfg.int("ann.ivf_nprobe", 2))

  def annPqFromConfig(s: SparkSession, dir: String,
                      cfg: graft.util.PipelineConfig): DataFrame =
    annPq(s, dir, cfg.int("ann.pq_subspaces", 4),
      cfg.int("ann.pq_codebook", 16), cfg.int("ann.lloyd_rounds", 2))

  /** Build-once memo for the persisted ANN indexes: a persisted index is
    * built once and probed many times, so repeat calls within one process
    * (bench steady-state runs, not fresh harness processes) reuse the
    * written index and its localCheckpoint'd quantizer tables — timed
    * runs then measure the PROBE path (centroid routing + pruned scan),
    * which is the operator's production cost. The inline q_ann_ivf /
    * q_ann_ivfpq variants deliberately keep timing the full
    * train+encode+build composition every run. */
  private val indexMemo =
    scala.collection.concurrent.TrieMap.empty[String, Seq[DataFrame]]

  /** Register a tmp directory for deletion when this JVM exits (the
    * persisted-IVF index dirs are PID-scoped, so nothing else can be
    * reading them by then). Idempotent per path. */
  private val exitCleanupPaths = scala.collection.concurrent.TrieMap.empty[String, Unit]
  private def cleanupAtExit(path: String): Unit =
    if (exitCleanupPaths.putIfAbsent(path, ()).isEmpty) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(path))
      }))
    }

  /** Local single-file parquet inputs arrive as ONE split, serializing
    * hash-heavy map stages on one core. If (and only if) the scan has
    * fewer splits than the cluster has slots, redistribute first — the
    * shuffled payload (docs) is tiny next to the md5 work it unlocks. At
    * scale, inputs have thousands of natural splits and this is a no-op. */
  private[graft] def spreadSmallInput(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    // inputFiles reads the relation's file index (no RDD physical-planning
    // pass, unlike df.rdd.getNumPartitions). Undercounts splits when one
    // file exceeds maxPartitionBytes — fine: the repartition is a no-op
    // guard for the single-file local-test case; real corpora have more
    // files than slots and skip it.
    val files = df.inputFiles.length
    if (files > 0 && files < slots) df.repartition(slots) else df
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PII redaction (the standard pre-training scrub): emails / IPv4 /
    // phone shapes replaced by category tags, counted per source. The
    // synthetic corpus carries no PII, so deterministic PII is injected
    // from doc_id arithmetic (both engines rebuild the identical text);
    // patterns are RE2-compatible so Java regex and DuckDB agree
    // byte-for-byte. Redaction is pure per-row expressions — codegen'd,
    // scan-speed, no shuffle beyond the final aggregate.
    "q_pii_redact" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .withColumn("text",
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"),
                lit("@example.com"))).otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit(" call 555-01"),
                (col("doc_id") % 10).cast("string"), lit("-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
                lit(".0.1"))).otherwise(lit(""))))
      graft.llm.TextOps.redactPii(d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_email")).as("emails"),
          sum(col("n_ip")).as("ips"),
          sum(col("n_phone")).as("phones"),
          sum(length(col("redacted"))).as("redacted_chars"))
        .orderBy(col("source"))
    }),

    // --- text analysis -----------------------------------------------------
    "q_text_tokens" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
        tokenCountBpeIsh(col("text")).as("n_bpeish_tokens"))
        .orderBy(col("doc_id"))),

    "q_text_quality" -> ((s, dir) => {
      val f = qualityFeatures(col("text"), stopwords)
      t(s, dir, "documents").select(
        col("doc_id"), f("n_chars").as("n_chars"), f("n_tokens").as("n_tokens"),
        f("avg_token_len").as("avg_token_len"),
        f("stopword_ratio").as("stopword_ratio"),
        f("distinct_ratio").as("distinct_ratio"))
        .withColumn("quality_tier",
          when(col("n_tokens") < 5, "too_short")
            .when(col("distinct_ratio") < 0.3, "repetitive")
            .when(col("stopword_ratio") > 0.5, "boilerplate")
            .otherwise("ok"))
        .orderBy(col("doc_id"))
    }),

    // Intra-document repetition metrics (the Gopher/C4 duplicate-n-gram
    // rules): explode 2-grams and aggregate per doc — the distributed
    // shape; a per-doc n-gram map never materializes in one place, so a
    // 1 GB pathological document costs shuffle rows, not executor heap.
    "q_repetition" -> ((s, dir) => {
      val grams = spreadSmallInput(t(s, dir, "documents"))
        .select(col("doc_id"), explode(shingles(tokens(col("text")), 2)).as("gram"))
      grams.groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).cast("long").as("n_grams"),
          count(lit(1)).cast("long").as("n_distinct"),
          max(col("c")).cast("long").as("max_gram_count"))
        .withColumn("dup_ratio",
          rnd(lit(1.0) - col("n_distinct") / col("n_grams").cast("double"), 4))
        .orderBy(col("doc_id"))
    }),

    // Eval-set decontamination (the PaLM/GPT-3 n-gram overlap rule): flag
    // training documents sharing 3-grams with a held-out benchmark set
    // (fixture role: every 50th doc). The benchmark's distinct grams are
    // BROADCAST — eval suites are tiny next to a training corpus, so the
    // corpus never shuffles for the membership test; the only exchanges
    // are the per-(doc, gram) distinct and the per-doc rollup it feeds
    // (same key prefix — one partitioning serves both).
    "q_decontaminate" -> ((s, dir) => {
      val docs = spreadSmallInput(t(s, dir, "documents"))
      val grams = (d: org.apache.spark.sql.DataFrame) => d
        .select(col("doc_id"), explode(shingles(tokens(col("text")), 3)).as("gram"))
      val bench = grams(docs.filter(col("doc_id") % 50 === 0))
        .select(col("gram")).distinct().withColumn("hit", lit(1))
      grams(docs.filter(col("doc_id") % 50 =!= 0)).distinct()
        .join(broadcast(bench), Seq("gram"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_grams"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_overlap"))
        .withColumn("contamination",
          rnd(col("n_overlap") / col("n_grams").cast("double"), 4))
        .withColumn("status",
          when(col("contamination") >= 0.2, "CONTAMINATED").otherwise("CLEAN"))
        .orderBy(col("doc_id"))
    }),

    // Composite keep/drop filter with reasons — the materialized decision
    // table a cleanup pipeline writes before dropping documents (first
    // failing rule wins: length → repetition → boilerplate → lang
    // agreement). Reuses the quality-feature and lang-ID expressions.
    "q_doc_filter" -> ((s, dir) => {
      val f = qualityFeatures(col("text"), stopwords)
      val scores = langScores(col("text"), langMarkers)
      val reason = when(f("n_tokens") < 5, "too_short")
        .when(f("distinct_ratio") < 0.3, "repetitive")
        .when(f("stopword_ratio") > 0.5, "boilerplate")
        .when(langPredict(scores) =!= col("lang"), "lang_mismatch")
        .otherwise("keep")
      t(s, dir, "documents")
        .select(col("doc_id"), reason.as("reason"))
        .withColumn("keep", col("reason") === "keep")
        .orderBy(col("doc_id"))
    }),

    "q_lang_id" -> ((s, dir) => {
      val scores = langScores(col("text"), langMarkers)
      t(s, dir, "documents").select(
        (col("doc_id") +: scores.map { case (l, c) => c.as(s"score_$l") } :+
          langPredict(scores).as("predicted") :+
          col("lang").as("actual")): _*)
        .withColumn("is_correct", col("predicted") === col("actual"))
        .orderBy(col("doc_id"))
    }),

    "q_doc_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        exactKey(col("text")).as("exact_key"),
        bagFingerprint(tokens(col("text"))).as("bag_fp"))
        .withColumn("fp_bucket", substring(col("bag_fp"), 1, 4))
        .orderBy(col("doc_id"))),

    // --- deduplication -----------------------------------------------------
    // Normalized exact-dedup: canonicalize (lowercase / strip punctuation /
    // collapse whitespace) then hash-groupBy — catches the case-and-
    // spacing variants a byte-exact key misses. Same scale shape as
    // q_dedup_exact: one map pass + one hash aggregation.
    "q_dedup_normalized" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(normalizedKey(col("text")).as("norm_key"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_variants"))
        .orderBy(col("norm_key"))),

    "q_dedup_exact" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(exactKey(col("text")).as("exact_key"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("exact_key"))),

    "q_minhash_sig" -> ((s, dir) =>
      minhashSignatures(t(s, dir, "documents")).orderBy(col("doc_id"))),

    // LSH bucket-join candidate pairs (empty on this corpus — no shared
    // trigram sketches in random text; the pair-generation shape is what
    // is verified; DedupSpec exercises real near-dups).
    "q_dedup_minhash" -> ((s, dir) =>
      minhashPairs(s, dir).orderBy(col("doc_a"), col("doc_b"))),

    // Pair list → cluster assignment (connected components) → the "keep
    // one doc per cluster" table every production dedup ends with. The
    // edge set is the minhash-LSH candidate pairs above.
    "q_dedup_clusters" -> ((s, dir) =>
      graft.llm.ClusterOps.assignClusters(t(s, dir, "documents"), minhashPairs(s, dir))
        .orderBy(col("doc_id"))),

    // INCREMENTAL dedup against a PERSISTED fingerprint index — the
    // 100 TB ingestion shape: three batches (fresh docs + deterministic
    // duplicate injections, cross-batch and intra-batch) ingest
    // sequentially through graft.llm.IncrementalDedup over a gvt index
    // table; each batch dedups against the WHOLE accepted corpus so far
    // at O(batch) equi-join cost — history is never rescanned or
    // re-paired. Exact variant: one band = md5(text). The accepted set
    // must equal the first-(batch, doc_id)-occurrence rule per content
    // hash.
    "q_dedup_incremental" -> ((s, dir) => {
      val idx = java.nio.file.Files.createTempDirectory("graft_incdex")
        .toString
      cleanupAtExit(idx)
      val out = ingestBatches(s, dir).zipWithIndex.map { case (b, i) =>
        graft.llm.IncrementalDedup.ingest(s, s"$idx/t",
          b.withColumn("fp", md5(col("text"))), Seq("fp"))
          .select(lit(i + 1L).as("batch_no"), col("doc_id"))
      }
      out.reduce(_.union(_)).orderBy(col("batch_no"), col("doc_id"))
    }),

    // The near-dup variant: the same three batches fingerprinted with
    // the banded MinHash signature table (2 bands × 4 sigs — the
    // q_dedup_minhash geometry) plus mutated near-copies; a document
    // drops when ANY band collides with the index or with a smaller-id
    // same-batch document (bucket-min). Only documents long enough to
    // carry a signature participate (the signature table's own
    // contract); the oracle replays the identical md5 arithmetic, so
    // whether a mutated copy lands in a shared band is deterministic
    // and engine-independent.
    "q_dedup_incremental_lsh" -> ((s, dir) => {
      val idx = java.nio.file.Files.createTempDirectory("graft_incdexl")
        .toString
      cleanupAtExit(idx)
      val out = ingestBatches(s, dir).zipWithIndex.map { case (b, i) =>
        graft.llm.IncrementalDedup.ingest(s, s"$idx/t",
          minhashSignatures(b).select(col("doc_id"), col("band0"), col("band1")),
          Seq("band0", "band1"))
          .select(lit(i + 1L).as("batch_no"), col("doc_id"))
      }
      out.reduce(_.union(_)).orderBy(col("batch_no"), col("doc_id"))
    }),

    // Corpus MIXING to target source proportions — the domain-weighting
    // step of training-data assembly (Pile/DoReMi-style): given integer
    // weights per source (here a deterministic 1..3 derived from the
    // source id; production plugs config), keep the maximum corpus
    // consistent with the target ratios — the scarcest source relative
    // to its weight keeps 100%, every other source downsamples by a
    // deterministic md5 bucket (stable across runs, engines, cluster
    // sizes — the property a reproducible data recipe needs; rand()
    // has none of them). Integer arithmetic throughout: targets and
    // thresholds are exact divisions of counts. Per-source stats are
    // dimension-small (distinct sources) and broadcast; the corpus is
    // touched by one count pass and one filtered count pass.
    "q_corpus_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val avail = docs.groupBy(col("source")).agg(count(lit(1)).as("n_avail"))
        .withColumn("w",
          (expr("CAST(substring(source, 4, 10) AS INT)") % 3 + 1).cast("long"))
      // the limiting source pins the global scale S = min(n_i / w_i):
      // everything is integer after this one ordering
      val lim = avail
        .orderBy((col("n_avail").cast("double") / col("w").cast("double")).asc,
          col("source"))
        .limit(1)
        .select(col("n_avail").as("n_lim"), col("w").as("w_lim"))
      val targets = avail.crossJoin(broadcast(lim))
        .withColumn("n_target", expr("(w * n_lim) div w_lim"))
        .withColumn("thresh", expr("(1000 * n_target) div n_avail"))
      val kept = docs
        .join(broadcast(targets.select(col("source"), col("thresh"))), Seq("source"))
        .filter(hashBucket1000(col("doc_id")) < col("thresh"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      targets.select(col("source"), col("n_avail"), col("w"), col("n_target"))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n_avail"), col("w"), col("n_target"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy(col("source"))
    }),

    // Temperature-scaled mixing (multilingual-LM style): sampling
    // weights w_i = n_i^(1/T) with T = 2 — upweights scarce sources
    // relative to proportional sampling, the knob multilingual and
    // multi-domain recipes tune. Deterministic cross-engine because
    // floor(sqrt(n)) is exact for integers < 2^53 (IEEE sqrt is
    // correctly rounded in both engines; perfect squares are exact),
    // and everything after the sqrt is integer arithmetic. Budget =
    // half the corpus; per-source allocation (budget·w_i) div Σw capped
    // at availability; the kept set is the same stable md5-bucket
    // downsample as q_corpus_mix. Same scale shape: per-source stats
    // broadcast, corpus touched by two scans.
    "q_corpus_mix_temp" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val avail = docs.groupBy(col("source")).agg(count(lit(1)).as("n_avail"))
        .withColumn("w", floor(sqrt(col("n_avail").cast("double"))).cast("long"))
      val tot = avail.agg(sum(col("w")).as("sum_w"),
        expr("sum(n_avail) div 2").as("budget"))
      val targets = avail.crossJoin(broadcast(tot))
        .withColumn("n_target",
          least(col("n_avail"), expr("(budget * w) div sum_w")))
        .withColumn("thresh", expr("(1000 * n_target) div n_avail"))
      val kept = docs
        .join(broadcast(targets.select(col("source"), col("thresh"))), Seq("source"))
        .filter(hashBucket1000(col("doc_id")) < col("thresh"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      targets.select(col("source"), col("n_avail"), col("w"), col("n_target"))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n_avail"), col("w"), col("n_target"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy(col("source"))
    }),

    // Cross-source duplication matrix: which sources share near-dup
    // content — the curation view that catches mirror sites and
    // re-crawled feeds (a pair of sources with heavy overlap should be
    // deduped against each other FIRST, or one dropped). Near-dup pairs
    // come from the verified minhash-LSH generator; the (doc_id,
    // source) lookup is PER-DOC — corpus-sized, NOT a broadcastable
    // dimension at 10⁹ docs — so the endpoint joins stay unhinted:
    // narrow (id, source) rows equi-join on doc ids (the planner
    // broadcasts at test scale by size, degrades to shuffled joins at
    // corpus scale), and the final rollup keys on (source_a, source_b).
    "q_source_overlap" -> ((s, dir) => {
      val src = t(s, dir, "documents").select(col("doc_id"), col("source"))
      minhashPairs(s, dir)
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
          Seq("doc_a"))
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
          Seq("doc_b"))
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // Quality-aware cluster election (the RefinedWeb/FineWeb keep rule):
    // keep each near-dup cluster's highest-QUALITY member, not its
    // lowest id — duplicates differ by truncation/boilerplate, and a
    // dedup that keeps the worst copy loses tokens. Quality here is the
    // integer token count (engine-exact; any integer score plugs in),
    // tie-broken by lowest doc_id: max(struct(quality, -doc_id)) per
    // cluster — one narrow aggregate + join over (cluster_id, quality)
    // keys on top of the exchange-free CC labels; text never shuffles.
    "q_dedup_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = docs.select(col("doc_id"),
        size_(tokens(col("text"))).cast("long").as("quality"))
      val labeled = graft.llm.ClusterOps
        .assignClusters(docs, minhashPairs(s, dir))
        .select(col("doc_id"), col("cluster_id"))
        .join(scored, Seq("doc_id"))
      val best = labeled.groupBy(col("cluster_id"))
        .agg(max(struct(col("quality"), (-col("doc_id")).as("nd"))).as("w"))
        .select(col("cluster_id"), (-col("w.nd")).as("keep_doc"))
      labeled.join(best, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("quality"),
          (col("doc_id") === col("keep_doc")).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Winnowing fingerprints (MOSS): window-minima over the 3-gram hash
    // sequence, w=4 — shared fingerprints localize copied passages (vs
    // MinHash's whole-doc resemblance). hs is checkpointed first so the w
    // shifted slices read a materialized array instead of re-hashing the
    // shingles w times (CollapseProject would inline the md5 transform).
    "q_winnow" -> ((s, dir) => {
      val withHs = spreadSmallInput(t(s, dir, "documents"))
        .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) >= 1)
        .select(col("doc_id"), shingleHashes(col("sh")).as("hs"))
        .localCheckpoint()
      withHs.select(col("doc_id"),
        explode(winnowFingerprints(col("hs"), 4)).as("fp"))
        .orderBy(col("doc_id"), col("fp"))
    }),

    "q_dedup_simhash" -> ((s, dir) =>
      spreadSmallInput(t(s, dir, "documents"))
        .select(col("doc_id"),
          simhashFromHashes(tokenHashes(tokens(col("text")))).as("simhash"))
        .withColumn("sim_bucket", substring(col("simhash"), 1, 8))
        .orderBy(col("doc_id"))),

    // SimHash near-dup pairs: candidates from the 8-bit bucket prefix,
    // exact filter by the native codegen'd hamming expression. The bucket
    // equi-join prunes the pair space the same way the minhash bands do.
    "q_simhash_pairs" -> ((s, dir) => {
      graft.functions.NativeFunctions.register(s)
      val h = spreadSmallInput(t(s, dir, "documents"))
        .select(col("doc_id"),
          simhashFromHashes(tokenHashes(tokens(col("text")))).as("simhash"))
        .withColumn("sim_bucket", substring(col("simhash"), 1, 8))
        .localCheckpoint()
      val a = h.as("a"); val b = h.as("b")
      a.join(b, col("a.sim_bucket") === col("b.sim_bucket") &&
        col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          graft.functions.NativeFunctions.hamming(
            col("a.simhash"), col("b.simhash")).as("hamming_dist"))
        .filter(col("hamming_dist") <= 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // 64-bit SimHash signatures + 4×16-bit LSH band keys — the
    // corpus-scale configuration (the 16-bit demo above has only 256
    // buckets, so candidates grow O(n²/256); here each band has 2^16
    // buckets and the hamming test runs at full 64-bit precision).
    "q_simhash64" -> ((s, dir) => {
      val cols = Seq(col("doc_id"), col("simhash64")) ++
        (0 until 4).map(bd => substring(col("simhash64"), bd * 16 + 1, 16).as(s"band$bd"))
      spreadSmallInput(t(s, dir, "documents"))
        .select(col("doc_id"),
          simhash64FromHashes(tokenHashes(tokens(col("text")))).as("simhash64"))
        .select(cols: _*)
        .orderBy(col("doc_id"))
    }),

    // Near-dup pairs from the 64-bit fingerprint (see simhash64Pairs:
    // first-matching-band residuals instead of a DISTINCT shuffle;
    // geometry from pipeline config at corpus scale, 4×16-bit pinned
    // here for the oracle corpus).
    "q_simhash64_pairs" -> ((s, dir) => simhash64Pairs(s, dir, 16, 4)),

    // Exact Jaccard verification over the minhash-LSH candidate pairs —
    // the production dedup shape: bands generate candidates, the exact
    // token-set similarity confirms them. The token-set table joins in
    // twice (by doc_a, by doc_b); at scale both joins shuffle on doc_id
    // against the (small) candidate list. Counts come from the fused
    // native JaccardCounts kernel: one pass per side, no intermediate
    // intersect/union arrays — the per-candidate hot loop.
    "q_ngram_jaccard" -> ((s, dir) => {
      graft.functions.NativeFunctions.register(s)
      val cand = minhashPairs(s, dir)
      val d = t(s, dir, "documents")
        .select(col("doc_id"), array_distinct(tokens(col("text"))).as("ts"))
        .localCheckpoint() // materialize once for both join branches
      cand.join(d.as("a"), col("doc_a") === col("a.doc_id"))
        .join(d.as("b"), col("doc_b") === col("b.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          graft.functions.NativeFunctions.jaccardCounts(
            col("a.ts"), col("b.ts")).as("jc"))
        .select(col("doc_a"), col("doc_b"),
          col("jc.n_common").as("n_common"), col("jc.n_union").as("n_union"),
          (col("jc.n_common").cast("double") / col("jc.n_union")).as("jaccard_sim"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Deterministic train/val/test split (80/10/10) by stable hash bucket
    // — reproducible across runs/engines/cluster sizes, unlike rand().
    "q_split_assign" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("bucket", hashBucket1000(col("doc_id")))
        .withColumn("split",
          when(col("bucket") < 800, "train")
            .when(col("bucket") < 900, "val")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("split"))),

    // Stratified deterministic sample: first n docs per language by hash
    // order (window over strata; the hash makes "first" stable).
    "q_sample_stratified" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(hashBucket1000(col("doc_id")), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("lang"), col("doc_id"), col("rn"))
        .orderBy(col("lang"), col("rn"))
    }),

    // Corpus vocabulary: top-20 tokens by frequency (explode -> count ->
    // ordered limit with tie-break).
    "q_top_terms" -> ((s, dir) =>
      spreadSmallInput(t(s, dir, "documents"))
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(20)),

    // TF-IDF: term frequency per (doc, token), document frequency per
    // token, idf = ln(N/df); emits each doc's top-scoring term. df comes
    // from a count-over-token window on the tf frame — ONE pipeline
    // (tokens → (doc,token) agg → token window → doc window). The earlier
    // broadcast(dfreq) formulation recomputed the whole explode+agg
    // subtree on the broadcast thread (derived-frame broadcast = duplicate
    // execution) and was bimodal in the bench; the window form also scales:
    // no assumption that the vocabulary fits in the driver.
    // ln() may differ in the last ulp across engines -> score rounded.
    "q_tfidf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = spreadSmallInput(t(s, dir, "documents"))
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val n = t(s, dir, "documents").agg(count(lit(1)).cast("double").as("n_docs"))
      val wTok = Window.partitionBy(col("token"))
      val wDoc = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_raw").desc, col("token"))
      tf.withColumn("df", count(lit(1)).over(wTok))
        .crossJoin(broadcast(n))
        .withColumn("score_raw", col("tf") * log(col("n_docs") / col("df")))
        .withColumn("rn", row_number().over(wDoc))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("token").as("top_term"), col("tf"), col("df"),
          rnd(col("score_raw"), 4).as("tfidf"))
        .orderBy(col("doc_id"))
    }),

    // BM25 ranking (Okapi, k1=1.2, b=0.75 — the Lucene-default scoring
    // the TF-IDF/inverted-index family was missing): query = the 3
    // globally most frequent tokens (deterministic: count desc, token
    // asc), rank the corpus, top 20. Per-term scores are scaled to
    // 1e-4 INTEGERS before the per-doc sum so the aggregation is
    // order-free and exact cross-engine (a double sum's addition order
    // is nondeterministic under partitioning).
    "q_bm25" -> ((s, dir) => {
      val docs = spreadSmallInput(t(s, dir, "documents"))
      val toks = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val qterms = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(3).select("token")
      tf.join(broadcast(qterms), "token")
        .join(dfreq, "token")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("s_scaled", floor(
          log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
            + lit(1.0)) *
            (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))) *
            lit(1e4) + lit(0.5)).cast("long"))
        .groupBy(col("doc_id"))
        .agg(sum(col("s_scaled")).as("bm25_1e4"),
          count(lit(1)).as("n_terms"))
        .orderBy(col("bm25_1e4").desc, col("doc_id")).limit(20)
        .select(col("doc_id"), col("bm25_1e4"), col("n_terms"))
    }),

    // --- similarity search -------------------------------------------------
    "q_embed_pairs" -> ((s, dir) => {
      graft.functions.NativeFunctions.register(s)
      val e = graft.sources.Tables.embeddings(s, dir)
      val a = e.as("a"); val b = e.as("b")
      a.join(b, col("b.vec_id") === col("a.vec_id") + 1)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          graft.functions.NativeFunctions.cosineSim(
            col("a.embedding"), col("b.embedding")).as("cos_sim"))
        .orderBy(col("vec_a"))
    }),

    "q_ann_bruteforce" -> ((s, dir) => {
      val e = graft.sources.Tables.embeddings(s, dir)
      SimilarityOps.bruteForceTopK(
        e.filter(col("vec_id") =!= 0L), e.filter(col("vec_id") === 0L),
        "vec_id", "embedding", 10)
        .select(col("vec_id"), col("label"), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    }),

    // Hybrid retrieval — reciprocal-rank fusion (RRF, k=60), the
    // standard fusion Elasticsearch/Vespa ship for combining retrieval
    // tiers: each list ranks its top-20 with a deterministic
    // (score, vec_id) tiebreak, and the fused score is Σ 1/(60+rank).
    // Here the EXACT cosine list fuses with the int8-QUANTIZED
    // approximate list (the compressed tier a production index serves
    // first). Ranks are integers and each vector contributes ≤2 terms,
    // so the fused double is cross-engine exact; output as 1e6
    // fixed-point.
    "q_hybrid_rrf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.NativeFunctions.register(s)
      val e = graft.sources.Tables.embeddings(s, dir)
      val w = Window.orderBy(col("score").desc, col("vec_id"))
      val qv = e.filter(col("vec_id") === 0L)
        .select(col("embedding").as("qvec"))
      val exact = e.filter(col("vec_id") =!= 0L).crossJoin(broadcast(qv))
        .select(col("vec_id"), graft.functions.NativeFunctions
          .cosineSim(col("embedding"), col("qvec")).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(20)
        .withColumn("r", row_number().over(w))
      val maxabs = aggregate(col("embedding"), lit(0.0d),
        (acc, x) => greatest(acc, abs(x.cast("double"))))
      val sq = e.select(col("vec_id"), (maxabs / 127.0).as("scale"),
          col("embedding"))
        .select(col("vec_id"), col("scale"),
          transform(col("embedding"), x =>
            floor(x.cast("double") / col("scale") + 0.5).cast("double"))
            .as("code"))
        .localCheckpoint()
      val q8 = sq.filter(col("vec_id") === 0L)
        .select(col("scale").as("q_scale"), col("code").as("q_code"))
      val approx = sq.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q8))
        .select(col("vec_id"),
          (aggregate(zip_with(col("code"), col("q_code"), (a, b) => a * b),
            lit(0.0d), (acc, x) => acc + x) * col("scale") * col("q_scale"))
            .as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(20)
        .withColumn("r", row_number().over(w))
      exact.select(col("vec_id"), col("r"))
        .unionByName(approx.select(col("vec_id"), col("r")))
        .groupBy(col("vec_id"))
        .agg(floor(sum(lit(1.0) / (lit(60) + col("r"))) * 1e6 + lit(0.5))
          .cast("long").as("rrf_1e6"),
          count(lit(1)).as("n_lists"))
        .orderBy(col("rrf_1e6").desc, col("vec_id")).limit(10)
    }),

    "q_ann_lsh" -> ((s, dir) => {
      val e = graft.sources.Tables.embeddings(s, dir).withColumn("bucket", srpBucket(col("embedding"), 8))
      val q = e.filter(col("vec_id") === 0L)
        .select(col("bucket").as("qbucket"), col("embedding").as("qvec"))
      graft.functions.NativeFunctions.register(s)
      e.filter(col("vec_id") =!= 0L)
        .join(broadcast(q), col("bucket") === col("qbucket"))
        .select(col("vec_id"), col("bucket"),
          graft.functions.NativeFunctions.cosineSim(
            col("embedding"), col("qvec")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(5)
    }),

    // Scalar-quantized (int8) ANN: per-vector symmetric quantization
    // (scale = max|x|/127, code = round(x/scale)), approximate score =
    // int-dot(codes) · scaleA · scaleB. The 100 TB path: codes are 4×
    // smaller than float32 and the integer dot is SIMD-friendly; the
    // quantized table is what a production index stores (here
    // localCheckpoint stands in for the persisted code table, and also
    // stops CollapseProject from inlining the max|x| fold into the
    // per-element quantize lambda). All arithmetic stays exact-integer
    // inside the dot product, so the oracle matches bit-for-bit.
    "q_ann_sq8" -> ((s, dir) => {
      val maxabs = aggregate(col("embedding"), lit(0.0d),
        (acc, x) => greatest(acc, abs(x.cast("double"))))
      val sq = graft.sources.Tables.embeddings(s, dir)
        .select(col("vec_id"), (maxabs / 127.0).as("scale"), col("embedding"))
        .select(col("vec_id"), col("scale"),
          transform(col("embedding"),
            x => floor(x.cast("double") / col("scale") + 0.5).cast("double")).as("code"))
        .localCheckpoint()
      val q = sq.filter(col("vec_id") === 0L)
        .select(col("scale").as("q_scale"), col("code").as("q_code"))
      sq.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          (aggregate(zip_with(col("code"), col("q_code"), (a, b) => a * b),
            lit(0.0d), (acc, x) => acc + x) * col("scale") * col("q_scale"))
            .as("approx_dot"))
        .orderBy(col("approx_dot").desc, col("vec_id"))
        .limit(10)
    }),

    // Embedding-cosine near-dup: SRP-bucketed candidate generation (the
    // scale path — candidates only within a bucket, an equi-join), then
    // exact cosine filter. Threshold 0.25 exercises the path on this
    // random corpus (real near-dups would sit near 1.0).
    "q_dedup_embedding" -> ((s, dir) => {
      val e = graft.sources.Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"), srpBucket(col("embedding"), 8).as("bucket"))
        .persist()
      graft.functions.NativeFunctions.register(s)
      val a = e.as("a"); val b = e.as("b")
      a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          graft.functions.NativeFunctions.cosineSim(
            col("a.embedding"), col("b.embedding")).as("cos_sim"))
        .filter(col("cos_sim") > 0.25)
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // Multi-table SRP near-dup (see mtSrpPairs: OR-amplified tables,
    // first-colliding-table residuals instead of a DISTINCT shuffle;
    // geometry from pipeline config at corpus scale).
    "q_dedup_embedding_mt" -> ((s, dir) => mtSrpPairs(s, dir, 16, 4)),

    // IVF ANN with the k-means-trained quantizer (see annIvf; geometry
    // from pipeline config at scale, 16 centroids / nprobe=2 pinned here
    // for the oracle corpus).
    "q_ann_ivf" -> ((s, dir) => annIvf(s, dir, 16, 2, 2)),

    // IVF through the kmeans|| production init (see annIvfKmpp: full
    // probe ⇒ must equal brute force — the partition-of-corpus
    // invariant; partial-probe recall through this init is IvfSpec's).
    "q_ann_ivf_kmpp" -> ((s, dir) => annIvfKmpp(s, dir, 16, 2, 8, 3)),

    // Persisted IVF: same semantics as q_ann_ivf but through the
    // production layout — inverted lists written partitioned by cent_id,
    // probe reads ONLY its nprobe=2 partitions (static partition pruning;
    // IvfSpec asserts the scan's partition count). Same oracle as the
    // inline variant: the layout must not change the answer.
    "q_ann_ivf_persisted" -> ((s, dir) => {
      // PID-scoped path: two concurrent harness runs must not share an
      // index dir (one process's overwrite would delete parquet files the
      // other is probing); toHexString instead of math.abs (abs(MinValue)
      // is negative). Re-runs within one process reuse one dir, and a
      // shutdown hook removes it so repeated harness processes don't
      // accrete index copies in tmpdir.
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_" +
        s"p${ProcessHandle.current().pid()}_${Integer.toHexString(dir.hashCode)}"
      cleanupAtExit(out)
      val e = graft.sources.Tables.embeddings(s, dir)
      val Seq(cents) = indexMemo.getOrElseUpdate(out, {
        val c = graft.llm.KMeans.train(e, 16, 2)
        graft.llm.IvfIndex.build(e, c, out)
        Seq(c)
      })
      graft.llm.IvfIndex.probe(s, out, cents, e.filter(col("vec_id") === 0L), 2)
        .filter(col("vec_id") =!= 0L)
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(5)
    }),

    // Product-quantized ANN (see annPq / PqOps: fixed-point training,
    // ADC lookup-table scoring; geometry from pipeline config at scale).
    "q_ann_pq" -> ((s, dir) => annPq(s, dir, 4, 16, 2)),

    // IVF-PQ composition (see annIvfPq: probe the coarse lists, ADC-score
    // only their 16x-compressed code rows — the FAISS IVFPQ shape).
    "q_ann_ivfpq" -> ((s, dir) => annIvfPq(s, dir, 16, 2, 2, 4, 16)),

    // Persisted IVF-PQ: identical semantics through the production
    // layout — the code table written partitioned by coarse cent_id, the
    // probe a statically partition-pruned scan of the compressed rows.
    // Same oracle as the inline composition: the layout must not change
    // the answer.
    "q_ann_ivfpq_persisted" -> ((s, dir) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_" +
        s"p${ProcessHandle.current().pid()}_${Integer.toHexString(dir.hashCode)}"
      cleanupAtExit(out)
      val e = graft.sources.Tables.embeddings(s, dir)
      val Seq(cents, books) = indexMemo.getOrElseUpdate(out, {
        val c = graft.llm.KMeans.train(e, 16, 2)
        val b = graft.llm.PqOps.trainCodebooks(e, 4, 16, 16, 2)
        graft.llm.IvfPqIndex.build(e, c, b, 4, 16, out)
        Seq(c, b)
      })
      graft.llm.IvfPqIndex.probe(s, out, cents, books,
        e.filter(col("vec_id") === 0L), 2, 4, 16)
        .filter(col("vec_id") =!= 0L)
        .orderBy(col("approx_dot").desc, col("vec_id"))
        .limit(10)
    }),

    // Frame sampling (video/audio chunk shape) over the text corpus as
    // binary payloads: 32-byte frames, ≤8 sampled per doc, md5 per frame.
    // Oracle note: DuckDB lacks BLOB substring, so its side slices the
    // VARCHAR — byte==char only because the corpus is pure ASCII (verified
    // for sf0.01/sf0.1); the Spark side is genuinely byte-based.
    "q_frame_sample" -> ((s, dir) => {
      val media = col("text").cast("binary")
      val nf = floor(length(media) / 32).cast("int")
      t(s, dir, "documents")
        .select(col("doc_id"), nf.as("n_frames"),
          posexplode(MultimodalOps.sampleFrames(media, 32, 8)))
        .select(col("doc_id"), col("n_frames"),
          col("pos").cast("int").as("frame_idx"), md5(col("col")).as("frame_md5"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // --- chunking & packing ------------------------------------------------
    // RAG-style overlapping token chunks (40-token windows, stride 30
    // by default; `chunk:` config section scales both). Chunk boundaries
    // are pure integer arithmetic on the token count and each chunk a
    // slice of the token array — one map + explode, no shuffle. The
    // explode multiplies rows ~len/stride×, so at corpus scale it runs
    // AFTER doc-level filters, never before them.
    "q_chunk" -> ((s, dir) => chunkTokens(s, dir, 40, 30)),

    // Training-sequence packing: assign docs (in doc_id order) to fixed
    // 512-token sequences by prefix-sum of token counts — the contiguous
    // greedy packer (docs straddling a boundary spill into the next
    // sequence; the spill is reported per sequence). The `pack:` config
    // section scales capacity and bucket width; see [[packSequences]]
    // for the distributed-prefix-sum shape.
    "q_pack" -> ((s, dir) => packSequences(s, dir, 512L, 100L)),

    // Boundary-split packing (see [[packFragmentsOf]]): the fragment
    // table a production trainer actually loads — every sequence exactly
    // 512 tokens except the last.
    "q_pack_split" -> ((s, dir) =>
      packFragmentsOf(t(s, dir, "documents"), 512L, 100L)),

    // Segment-level global dedup (the C4 "repeated spans" rule / Lee et
    // al. 2022 exact-substring dedup, on fixed 10-token segments; the
    // `segdedup:` config section sets the width): every occurrence of a
    // segment after its first (by doc_id, seg_id) is removed. The
    // operator result is the production artifact — the text-free
    // (doc_id, seg_id) drop list; see [[segmentDropList]] for the
    // hashes-only shuffle shape, and [[dedupSegments]] (fixture path,
    // CorpusOpsSpec) for the rebuilt-text verification.
    "q_dedup_segments" -> ((s, dir) =>
      segmentDropList(s, dir, 10).orderBy(col("doc_id"), col("seg_id"))),

    // Sliding-window exact-substring dedup: FULL recall for duplicated
    // runs of ≥ 10 tokens at any alignment (the grid above misses runs
    // shorter than two aligned cells — CorpusOpsSpec pins a straddling
    // fixture, NOTES.md quantifies the recall gap). Output is the merged
    // maximal drop-span list; see [[dupSpanDropList]].
    "q_dedup_spans" -> ((s, dir) =>
      dupSpanDropList(s, dir, 10).orderBy(col("doc_id"), col("span_start"))),

    // Span-level decontamination: the exact benchmark-matching token
    // spans (5-token windows) for surgical removal — see
    // [[decontaminateSpans]]; q_decontaminate stays the doc-level rate.
    "q_decontaminate_spans" -> ((s, dir) =>
      decontaminateSpans(s, dir, 5).orderBy(col("doc_id"), col("span_start"))),

    // --- retrieval & quality scoring ---------------------------------------
    // Inverted index construction (the search side of the corpus): term →
    // document frequency, collection frequency, head of the sorted
    // posting list. A production index shards postings by (term,
    // doc-range) so no single reducer materializes a stopword's full
    // posting list; the head-slice here keeps the verified output bounded
    // while exercising the same explode→aggregate shape.
    "q_inverted_index" -> ((s, dir) => {
      val occ = spreadSmallInput(t(s, dir, "documents"))
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      occ.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("cf"),
          array_join(transform(
            slice(array_sort(collect_set(col("doc_id"))), 1, 20),
            x => x.cast("string")), ",").as("postings_head"))
        .orderBy(col("term"))
    }),

    // n-gram language-model table — the classic MapReduce LM workload:
    // bigram conditional probabilities P(w2|w1) = c(w1 w2) / c(w1 ·)
    // from exact integer counts (the ratio is the only float, rnd'd).
    // Two hash aggregations sharing the w1 key prefix; the head count
    // derives from the bigram table itself (no second corpus pass). The
    // top-20 continuations per head word bound the verified output —
    // ranked (count desc, w2 asc), fully deterministic.
    "q_bigram_lm" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bi = spreadSmallInput(t(s, dir, "documents"))
        .select(explode(shingles(tokens(col("text")), 2)).as("bigram"))
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val heads = bi.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val rk = Window.partitionBy(col("w1")).orderBy(col("c12").desc, col("w2"))
      bi.join(heads, Seq("w1"))
        .withColumn("rnk", row_number().over(rk).cast("long"))
        .filter(col("rnk") <= 20)
        .select(col("w1"), col("w2"), col("c12"), col("c1"), col("rnk"),
          rnd(col("c12") / col("c1").cast("double"), 4).as("p"))
        .orderBy(col("w1"), col("rnk"))
    }),

    // Fuzzy string matching surface: Levenshtein distance + normalized
    // similarity over candidate pairs (adjacent doc ids as the fixture
    // pair source, like q_ngram_jaccard's demo shape — in production the
    // pairs come from the LSH candidate generators, never all-pairs:
    // edit distance is O(len²) per pair and must stay OFF the full
    // cross product). Distances on the 80-char prefix bound the cost.
    "q_fuzzy_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 80).as("head"))
      val a = d.select(col("doc_id").as("id_a"), col("head").as("head_a"))
      val b = d.select((col("doc_id") - 1).as("id_a"),
        col("doc_id").as("id_b"), col("head").as("head_b"))
      a.join(b, Seq("id_a"))
        .withColumn("edit_dist",
          levenshtein(col("head_a"), col("head_b")).cast("long"))
        .withColumn("sim",
          rnd(lit(1.0) - col("edit_dist") /
            greatest(length(col("head_a")), length(col("head_b")))
              .cast("double"), 4))
        .select(col("id_a"), col("id_b"), col("edit_dist"), col("sim"))
        .orderBy(col("id_a"))
    }),

    // End-to-end corpus-pipeline decision table — the TextMedallion
    // silver election (exact-dup winners ∩ quality keeps), verified as
    // one query so the composed pipeline has an oracle, not just its
    // parts.
    "q_text_pipeline" -> ((s, dir) =>
      docDecisions(t(s, dir, "documents"))
        .select(col("doc_id"), col("status"), col("in_silver"))
        .orderBy(col("doc_id"))),

    // The corpus-quality mart over the SAME election, as a verified
    // registry query (TextMedallion's gold mart is spec-only — this is
    // its oracle-checked registry shape): per (source, lang, status)
    // doc and token inventory — what a curation dashboard reads to see
    // WHERE the corpus is losing documents. One hash aggregation over
    // the election output; token counts stay integers.
    "q_corpus_mart" -> ((s, dir) =>
      docDecisions(t(s, dir, "documents"))
        .groupBy(col("source"), col("lang"), col("status"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens"))
        .orderBy(col("source"), col("lang"), col("status"))),

    // Unigram-LM quality proxy: per-doc mean corpus frequency of its
    // tokens and the share of rare tokens (corpus count < 100) — the
    // cheap stand-in for perplexity filtering when no LM is at hand
    // (frequency-based first-pass quality, as in C4/Gopher pipelines).
    // The vocabulary table is tiny relative to the corpus (Heaps' law)
    // and is BROADCAST — the corpus never shuffles for the lookup; the
    // only exchange is the per-doc rollup.
    "q_unigram_quality" -> ((s, dir) => {
      val occ = spreadSmallInput(t(s, dir, "documents"))
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val vocab = occ.groupBy(col("term")).agg(count(lit(1)).as("cf"))
      occ.join(broadcast(vocab), Seq("term"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          sum(when(col("cf") < 100, 1L).otherwise(0L)).cast("long").as("n_rare"),
          rnd(sum(col("cf")) / count(lit(1)).cast("double"), 2).as("mean_cf"))
        .withColumn("rare_ratio", rnd(col("n_rare") / col("n_tokens").cast("double"), 4))
        .orderBy(col("doc_id"))
    }),

    // Per-label embedding centroids — the class-prototype table
    // (nearest-centroid classifiers, few-shot seed selection, per-class
    // drift monitoring). One explode → hash aggregate keyed (label,
    // dim): k·dims output rows, trivially small at any corpus size.
    // Exactness across engines: floats snap to a 2⁻²⁰ fixed-point grid
    // BEFORE summing (integer-valued doubles — exact and
    // order-insensitive in both engines; a raw float/double sum would
    // depend on partition order, and DuckDB's float→DECIMAL cast goes
    // through the shortest string — NOTES.md), then ONE division per
    // (label, dim) for the mean. Long rows (label, dim, mean), not an
    // array column, so the oracle compares scalars.
    "q_label_centroids" -> ((s, dir) => {
      val fp = graft.sources.Tables.embeddings(s, dir)
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("label"), col("dim").cast("long").as("dim"),
          floor(col("v").cast("double") * 1048576.0 + 0.5).cast("long").as("vfp"))
      fp.groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("vfp")).as("sum_fp"))
        .withColumn("mean_v",
          rnd(col("sum_fp").cast("double") /
            (col("n_vecs").cast("double") * 1048576.0), 6))
        .select(col("label"), col("dim"), col("n_vecs"), col("mean_v"))
        .orderBy(col("label"), col("dim"))
    }),

    // Bigram-LM fit scoring — the perplexity-proxy one step up from
    // q_unigram_quality: how well each document's bigrams fit the
    // corpus-wide bigram LM (q_bigram_lm's table). Emitted as INTEGER
    // sums (Σ c(w1,w2), Σ c(w1·)) with ONE final division — a float
    // mean of per-bigram ratios would be summation-order-dependent and
    // never hash-match. Plan shape: the bigram vocabulary grows toward
    // O(corpus tokens) — too big for the broadcast the unigram path
    // uses — so doc bigrams SHUFFLE-join the count tables on the gram
    // hash key (narrow rows: ids + counts, never document text); the
    // head table derives from the bigram table without a second corpus
    // pass.
    "q_lm_fit" -> ((s, dir) => {
      val occ = spreadSmallInput(t(s, dir, "documents"))
        .select(col("doc_id"),
          explode(shingles(tokens(col("text")), 2)).as("gram"))
        .withColumn("gkey", md5(col("gram")))
        .withColumn("w1", substring_index(col("gram"), " ", 1))
      // the LM table is VOCABULARY-sized (bounded, not corpus-sized) —
      // persisting it keeps the head rollup and the probe join reading
      // one materialization instead of re-exploding the corpus per use
      val lm = occ.groupBy(col("gkey"), col("w1"))
        .agg(count(lit(1)).as("c2"))
        .persist()
      val heads = lm.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
      occ.select(col("doc_id"), col("gkey"), col("w1"))
        .join(lm.select(col("gkey"), col("c2")), Seq("gkey"))
        .join(heads, Seq("w1"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          sum(col("c2")).cast("long").as("sum_bigram_count"),
          sum(col("c1")).cast("long").as("sum_head_count"))
        .withColumn("lm_fit",
          rnd(col("sum_bigram_count") / col("sum_head_count").cast("double"), 6))
        .orderBy(col("doc_id"))
    }),

    // --- multimodal plumbing -----------------------------------------------
    "q_multimodal_meta" -> ((s, dir) =>
      MultimodalOps.asMediaTable(t(s, dir, "documents"))
        .select(col("id"), col("mimeType").as("mime_type"),
          octet_length(col("media")).cast("long").as("byte_len"),
          md5(col("media")).as("payload_md5"))
        .orderBy(col("id"))))

  private[graft] val W = raw"regexp_split_to_array(lower(trim(text)), '\s+')"

  /** Shared doc-filter CTE chain (q → sc → r): quality features, lang
    * scores and the first-failing-rule reason per document. Used by the
    * q_doc_filter oracle and composed into q_text_pipeline's. */
  private lazy val REASON_CTES: String = {
    val scoreExprs = langMarkers.map { case (lang, words) =>
      words.map(w => s"(CASE WHEN p LIKE '% $w %' THEN 1 ELSE 0 END)")
        .mkString(" + ") + s" AS score_$lang"
    }.mkString(",\n    ")
    val all = langMarkers.map { case (l, _) => s"score_$l" }.mkString(", ")
    val predCase = "CASE " + langMarkers.map { case (l, _) =>
      s"WHEN score_$l = greatest($all) THEN '$l'"
    }.mkString(" ") + " ELSE 'und' END"
    s"""q AS (
       |  SELECT doc_id, lang,
       |    CAST(len(w) AS BIGINT) AS n_tokens,
       |    len(list_filter(w, x -> x IN ('the','a','of','and','to','in')))
       |      / CAST(len(w) AS DOUBLE) AS stopword_ratio,
       |    len(list_distinct(w)) / CAST(len(w) AS DOUBLE) AS distinct_ratio,
       |    ' ' || lower(text) || ' ' AS p
       |  FROM (SELECT doc_id, lang, text, $W AS w FROM documents)),
       |sc AS (
       |  SELECT doc_id, lang, n_tokens, stopword_ratio, distinct_ratio,
       |    $scoreExprs
       |  FROM q),
       |r AS (
       |  SELECT doc_id,
       |    CASE WHEN n_tokens < 5 THEN 'too_short'
       |      WHEN distinct_ratio < 0.3 THEN 'repetitive'
       |      WHEN stopword_ratio > 0.5 THEN 'boilerplate'
       |      WHEN ($predCase) <> lang THEN 'lang_mismatch'
       |      ELSE 'keep' END AS reason
       |  FROM sc)""".stripMargin
  }
  /** Shared minhash CTE: same base-hash + linear-congruence family as
    * TextOps (constants interpolated from MinhashCoeffs, single source of
    * truth). */
  private val SIG_LINES = graft.llm.TextOps.MinhashCoeffs.zipWithIndex.map {
    case ((a, b), k) =>
      s"list_min(list_transform(hs, h -> (h * $a + $b) % ${graft.llm.TextOps.MinhashP})) AS sig$k"
  }.mkString(",\n         |    ")

  /** The ingestBatches construction, replayed (see the Spark helper). */
  private val CORPUS_SQL =
    """d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      |corpus AS (
      |  SELECT 1 AS batch_no, doc_id, text FROM d WHERE doc_id % 3 = 0
      |  UNION ALL SELECT 2, doc_id, text FROM d WHERE doc_id % 3 = 1
      |  UNION ALL SELECT 2, doc_id + 10000, text FROM d WHERE doc_id % 6 = 0
      |  UNION ALL SELECT 2, doc_id + 20000, text FROM d
      |    WHERE doc_id % 3 = 1 AND doc_id % 5 = 0
      |  UNION ALL SELECT 3, doc_id, text FROM d WHERE doc_id % 3 = 2
      |  UNION ALL SELECT 3, doc_id + 30000, text FROM d
      |    WHERE doc_id % 3 = 1 AND doc_id % 7 = 0
      |  UNION ALL SELECT 3, doc_id + 40000, text || ' appended tail' FROM d
      |    WHERE doc_id % 12 = 0)""".stripMargin

  // lazy: references SHINGLES/W declared later in the object
  private lazy val SIG_CTE: String =
    s"""WITH base AS (
       |  SELECT doc_id, $SHINGLES AS sh
       |  FROM (SELECT doc_id, $W AS w FROM documents)),
       |hashed AS (
       |  SELECT doc_id, list_transform(sh,
       |    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % ${graft.llm.TextOps.MinhashP}) AS hs
       |  FROM base WHERE len(sh) >= 1),
       |sig AS (
       |  SELECT doc_id,
       |    $SIG_LINES
       |  FROM hashed)""".stripMargin
  private[graft] val SHINGLES =
    s"""CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w) - 2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END""".stripMargin

  /** 64-bit simhash oracle fragments: two bits per md5 hex char (high +
    * second nibble bit), mirroring TextOps.simhash64FromHashes. */
  private val SIM64_SUMS = (1 to 64).map { j =>
    val ones = if (j % 2 == 1) "('8','9','a','b','c','d','e','f')"
               else "('4','5','6','7','c','d','e','f')"
    s"sum(CASE WHEN substr(md5(tok), ${(j + 1) / 2}, 1) IN $ones THEN 1 ELSE -1 END) AS b$j"
  }.mkString(",\n    ")
  private val SIM64_BITS = (1 to 64).map(j => s"(CASE WHEN b$j > 0 THEN '1' ELSE '0' END)")
    .mkString(" || ")

  /** SRP bucket over dims [start, start+16) for the multi-table oracle. */
  private def srpBucketSql(tbl: String, start: Int): String =
    (start until start + 16).map(k =>
      s"(CASE WHEN $tbl.embedding[$k] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")

  private val CosSql =
    """list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
      |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))""".stripMargin

  val oracle: Map[String, String] = Map(

    // PII scrub: same injected text, same RE2 patterns, counts on the
    // ORIGINAL text, tags applied email → ip → phone.
    "q_pii_redact" ->
      """WITH d AS (
        |  SELECT source,
        |    text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id ||
        |      '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-01' ||
        |      CAST(doc_id % 10 AS VARCHAR) || '-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' from 10.' ||
        |      CAST(doc_id % 256 AS VARCHAR) || '.0.1' ELSE '' END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (
        |  SELECT source,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    len(regexp_extract_all(text,
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ip,
        |    len(regexp_extract_all(text,
        |      '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS n_phone,
        |    regexp_replace(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |      '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g') AS redacted
        |  FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_email) AS BIGINT) AS emails,
        |  CAST(sum(n_ip) AS BIGINT) AS ips,
        |  CAST(sum(n_phone) AS BIGINT) AS phones,
        |  CAST(sum(len(redacted)) AS BIGINT) AS redacted_chars
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q_chunk" ->
      s"""WITH d AS (SELECT doc_id, $W AS tk FROM documents),
         |n AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM d),
         |k AS (SELECT doc_id, tk,
         |  unnest(range(0, CASE WHEN n <= 40 THEN 1 ELSE (n - 11) // 30 + 1 END))
         |    AS chunk_id FROM n)
         |SELECT doc_id, chunk_id,
         |  CAST(len(list_slice(tk, chunk_id*30+1, chunk_id*30+40)) AS BIGINT)
         |    AS n_chunk_tokens,
         |  md5(array_to_string(list_slice(tk, chunk_id*30+1, chunk_id*30+40), ' '))
         |    AS chunk_key
         |FROM k ORDER BY doc_id, chunk_id""".stripMargin,

    "q_pack" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($W) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS cum FROM d),
         |b AS (SELECT doc_id, n_tokens, cum, (cum - n_tokens) // 512 AS seq_id FROM c)
         |SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
         |  greatest(max(cum) - (seq_id + 1) * 512, 0) AS spill
         |FROM b GROUP BY seq_id ORDER BY seq_id""".stripMargin,

    "q_pack_split" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($W) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS cum FROM d),
         |s AS (SELECT doc_id, n_tokens, cum, cum - n_tokens AS start0,
         |  unnest(range((cum - n_tokens) // 512, (cum - 1) // 512 + 1)) AS seq_id
         |  FROM c WHERE n_tokens > 0)
         |SELECT seq_id, doc_id,
         |  greatest(0, seq_id * 512 - start0) AS tok_start,
         |  least(n_tokens, (seq_id + 1) * 512 - start0)
         |    - greatest(0, seq_id * 512 - start0) AS frag_tokens
         |FROM s ORDER BY seq_id, doc_id""".stripMargin,

    "q_dedup_segments" ->
      s"""WITH d AS (SELECT doc_id, $W AS tk FROM documents),
         |sg AS (SELECT doc_id, tk,
         |  unnest(range(0, (len(tk) - 1) // 10 + 1)) AS seg_id FROM d),
         |s2 AS (SELECT doc_id, seg_id,
         |  array_to_string(list_slice(tk, seg_id*10+1, seg_id*10+10), ' ') AS seg
         |  FROM sg),
         |r AS (SELECT doc_id, seg_id, row_number() OVER (
         |    PARTITION BY md5(seg) ORDER BY doc_id, seg_id) AS rn FROM s2)
         |SELECT doc_id, seg_id FROM r WHERE rn > 1
         |ORDER BY doc_id, seg_id""".stripMargin,

    "q_decontaminate_spans" ->
      s"""WITH d AS (SELECT doc_id, $W AS tk FROM documents),
         |w AS (SELECT doc_id, unnest(range(0, len(tk) - 5 + 1)) AS pos, tk
         |  FROM d WHERE len(tk) >= 5),
         |k AS (SELECT doc_id, pos,
         |  md5(array_to_string(list_slice(tk, pos + 1, pos + 5), ' ')) AS wkey
         |  FROM w),
         |b AS (SELECT DISTINCT wkey FROM k WHERE doc_id % 50 = 0),
         |l AS (SELECT doc_id, pos FROM k JOIN b USING (wkey)
         |  WHERE doc_id % 50 <> 0),
         |m AS (SELECT doc_id, pos, max(pos + 5) OVER (PARTITION BY doc_id
         |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    AS prev_end FROM l),
         |i AS (SELECT doc_id, pos, sum(CASE WHEN prev_end IS NULL
         |      OR pos > prev_end THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY pos) AS span FROM m)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 5 AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_windows
         |FROM i GROUP BY doc_id, span
         |ORDER BY doc_id, span_start""".stripMargin,

    "q_dedup_spans" ->
      s"""WITH d AS (SELECT doc_id, $W AS tk FROM documents),
         |w AS (SELECT doc_id, unnest(range(0, len(tk) - 10 + 1)) AS pos, tk
         |  FROM d WHERE len(tk) >= 10),
         |k AS (SELECT doc_id, pos,
         |  md5(array_to_string(list_slice(tk, pos + 1, pos + 10), ' ')) AS wkey
         |  FROM w),
         |r AS (SELECT doc_id, pos, row_number() OVER (
         |    PARTITION BY wkey ORDER BY doc_id, pos) AS rn FROM k),
         |l AS (SELECT doc_id, pos FROM r WHERE rn > 1),
         |m AS (SELECT doc_id, pos, max(pos + 10) OVER (PARTITION BY doc_id
         |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    AS prev_end FROM l),
         |i AS (SELECT doc_id, pos, sum(CASE WHEN prev_end IS NULL
         |      OR pos > prev_end THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY pos) AS span FROM m)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 10 AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_windows
         |FROM i GROUP BY doc_id, span
         |ORDER BY doc_id, span_start""".stripMargin,

    "q_inverted_index" ->
      s"""WITH o AS (SELECT doc_id, unnest($W) AS term FROM documents)
         |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         |  CAST(count(*) AS BIGINT) AS cf,
         |  array_to_string(list_slice(list_sort(list(DISTINCT doc_id)), 1, 20), ',')
         |    AS postings_head
         |FROM o GROUP BY term ORDER BY term""".stripMargin,

    "q_unigram_quality" ->
      s"""WITH o AS (SELECT doc_id, unnest($W) AS term FROM documents),
         |v AS (SELECT term, count(*) AS cf FROM o GROUP BY term),
         |j AS (SELECT doc_id, cf FROM o JOIN v USING (term))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN cf < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
         |  floor(sum(cf) / CAST(count(*) AS DOUBLE) * 1e2 + 0.5) / 1e2 AS mean_cf,
         |  floor(sum(CASE WHEN cf < 100 THEN 1 ELSE 0 END)
         |    / CAST(count(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS rare_ratio
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_text_tokens" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(w) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(w) + coalesce(list_sum(list_transform(w,
         |    x -> greatest(CAST(ceil(length(x) / 4.0) AS BIGINT) - 1, 0))), 0) AS BIGINT)
         |    AS n_bpeish_tokens
         |FROM (SELECT doc_id, text, $W AS w FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      s"""SELECT doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio, distinct_ratio,
         |  CASE WHEN n_tokens < 5 THEN 'too_short'
         |    WHEN distinct_ratio < 0.3 THEN 'repetitive'
         |    WHEN stopword_ratio > 0.5 THEN 'boilerplate'
         |    ELSE 'ok' END AS quality_tier
         |FROM (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len(w) AS BIGINT) AS n_tokens,
         |    length(regexp_replace(text, '\\s+', '', 'g')) / CAST(len(w) AS DOUBLE) AS avg_token_len,
         |    len(list_filter(w, x -> x IN ('the','a','of','and','to','in')))
         |      / CAST(len(w) AS DOUBLE) AS stopword_ratio,
         |    len(list_distinct(w)) / CAST(len(w) AS DOUBLE) AS distinct_ratio
         |  FROM (SELECT doc_id, text, $W AS w FROM documents))
         |ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    (CASE WHEN p LIKE '% the %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% and %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% of %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% to %' THEN 1 ELSE 0 END) AS score_en,
        |    (CASE WHEN p LIKE '% der %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% und %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% das %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% ist %' THEN 1 ELSE 0 END) AS score_de,
        |    (CASE WHEN p LIKE '% le %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% la %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% et %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% les %' THEN 1 ELSE 0 END) AS score_fr,
        |    (CASE WHEN p LIKE '% el %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% de %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% que %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% los %' THEN 1 ELSE 0 END) AS score_es
        |  FROM (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents))
        |SELECT doc_id, score_en, score_de, score_fr, score_es,
        |  CASE WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
        |    WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
        |    WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
        |    WHEN score_es = greatest(score_en, score_de, score_fr, score_es) THEN 'es'
        |    ELSE 'und' END AS predicted,
        |  lang AS actual,
        |  (CASE WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
        |    WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
        |    WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
        |    WHEN score_es = greatest(score_en, score_de, score_fr, score_es) THEN 'es'
        |    ELSE 'und' END) = lang AS is_correct
        |FROM scored ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN list_transform(
         |      generate_series(1, len(w) - 2),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         |    ELSE [] END) AS gram
         |  FROM (SELECT doc_id, $W AS w FROM documents)),
         |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
         |cg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 50 <> 0),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(sum(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_overlap
         |  FROM cg LEFT JOIN bg USING (gram) GROUP BY doc_id)
         |SELECT doc_id, n_grams, n_overlap,
         |  floor(n_overlap / CAST(n_grams AS DOUBLE) * 1e4 + 0.5) / 1e4
         |    AS contamination,
         |  CASE WHEN floor(n_overlap / CAST(n_grams AS DOUBLE) * 1e4 + 0.5) / 1e4
         |    >= 0.2 THEN 'CONTAMINATED' ELSE 'CLEAN' END AS status
         |FROM agg ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(CASE WHEN len(w) >= 2 THEN list_transform(
         |      generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
         |    ELSE [] END) AS gram
         |  FROM (SELECT doc_id, $W AS w FROM documents)),
         |pc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(max(c) AS BIGINT) AS max_gram_count,
         |  floor((1.0 - count(*) / CAST(sum(c) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS dup_ratio
         |FROM pc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_doc_filter" ->
      s"""WITH $REASON_CTES
         |SELECT doc_id, reason, reason = 'keep' AS keep FROM r ORDER BY doc_id""".stripMargin,

    "q_bigram_lm" ->
      s"""WITH tk AS (SELECT doc_id, $W AS w FROM documents),
         |bg AS (SELECT unnest(CASE WHEN len(w) >= 2 THEN list_transform(
         |    generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
         |  ELSE [] END) AS bigram FROM tk),
         |bi AS (SELECT string_split(bigram, ' ')[1] AS w1,
         |    string_split(bigram, ' ')[2] AS w2,
         |    CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
         |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bi GROUP BY 1),
         |r AS (SELECT bi.w1, w2, c12, c1,
         |    CAST(row_number() OVER (PARTITION BY bi.w1 ORDER BY c12 DESC, w2)
         |      AS BIGINT) AS rnk
         |  FROM bi JOIN uni ON bi.w1 = uni.w1)
         |SELECT w1, w2, c12, c1, rnk,
         |  floor(c12 / CAST(c1 AS DOUBLE) * 1e4 + 0.5) / 1e4 AS p
         |FROM r WHERE rnk <= 20 ORDER BY w1, rnk""".stripMargin,

    "q_label_centroids" ->
      """WITH fp AS (
        |  SELECT CAST(label AS BIGINT) AS label, d.dim - 1 AS dim,
        |    CAST(floor(CAST(embedding[d.dim] AS DOUBLE) * 1048576.0 + 0.5)
        |      AS BIGINT) AS vfp
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS dim) d)
        |SELECT label, CAST(dim AS BIGINT) AS dim,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  floor(sum(vfp) / (CAST(count(*) AS DOUBLE) * 1048576.0) * 1e6 + 0.5) / 1e6
        |    AS mean_v
        |FROM fp GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "q_lm_fit" ->
      s"""WITH tk AS (SELECT doc_id, $W AS w FROM documents),
         |o AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2 THEN list_transform(
         |    generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
         |  ELSE [] END) AS gram FROM tk),
         |lm AS (SELECT gram, string_split(gram, ' ')[1] AS w1,
         |    CAST(count(*) AS BIGINT) AS c2 FROM o GROUP BY 1, 2),
         |heads AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM lm GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(c2) AS BIGINT) AS sum_bigram_count,
         |  CAST(sum(c1) AS BIGINT) AS sum_head_count,
         |  floor(sum(c2) / CAST(sum(c1) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS lm_fit
         |FROM o JOIN lm USING (gram) JOIN heads USING (w1)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_fuzzy_pairs" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 80) AS head FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.head AS head_a, b.head AS head_b
        |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1)
        |SELECT id_a, id_b,
        |  CAST(levenshtein(head_a, head_b) AS BIGINT) AS edit_dist,
        |  floor((1.0 - levenshtein(head_a, head_b)
        |    / CAST(greatest(length(head_a), length(head_b)) AS DOUBLE))
        |    * 1e4 + 0.5) / 1e4 AS sim
        |FROM p ORDER BY id_a""".stripMargin,

    "q_text_pipeline" ->
      s"""WITH $REASON_CTES,
         |w AS (SELECT md5(text) AS k, min(doc_id) AS keep
         |  FROM documents GROUP BY 1),
         |st AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id <> w.keep THEN 'dup'
         |      WHEN r.reason <> 'keep' THEN r.reason
         |      ELSE 'silver' END AS status
         |  FROM documents d
         |    JOIN w ON md5(d.text) = w.k
         |    JOIN r ON r.doc_id = d.doc_id)
         |SELECT doc_id, status, status = 'silver' AS in_silver
         |FROM st ORDER BY doc_id""".stripMargin,

    "q_corpus_mart" ->
      s"""WITH $REASON_CTES,
         |w AS (SELECT md5(text) AS k, min(doc_id) AS keep
         |  FROM documents GROUP BY 1),
         |st AS (
         |  SELECT d.source, d.lang, CAST(len($W) AS BIGINT) AS n_tokens,
         |    CASE WHEN d.doc_id <> w.keep THEN 'dup'
         |      WHEN r.reason <> 'keep' THEN r.reason
         |      ELSE 'silver' END AS status
         |  FROM documents d
         |    JOIN w ON md5(d.text) = w.k
         |    JOIN r ON r.doc_id = d.doc_id)
         |SELECT source, lang, status, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(min(n_tokens) AS BIGINT) AS min_tokens,
         |  CAST(max(n_tokens) AS BIGINT) AS max_tokens
         |FROM st GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_doc_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS exact_key,
         |  md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS bag_fp,
         |  substr(md5(array_to_string(list_sort(list_distinct(w)), ' ')), 1, 4) AS fp_bucket
         |FROM (SELECT doc_id, text, $W AS w FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS exact_key, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY exact_key NULLS FIRST""".stripMargin,

    // DuckDB regexp_replace needs the 'g' flag (single-replace default);
    // \p{L}\p{N} + explicit whitespace class agree exactly between Java
    // regex and RE2 (Java's \s includes \x0B, RE2's does not — avoided).
    // NULLS FIRST matches Spark's ascending default for a NULL text row.
    "q_dedup_normalized" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^\p{L}\p{N}\t\n\f\r ]', '', 'g'), '[\t\n\f\r ]+', ' ', 'g'))) AS norm_key,
        |  min(doc_id) AS keep_doc_id, count(*) AS n_variants
        |FROM documents GROUP BY 1 ORDER BY norm_key NULLS FIRST""".stripMargin,

    "q_minhash_sig" ->
      s"""$SIG_CTE
         |SELECT doc_id, sig0, sig1, sig2, sig3, sig4, sig5, sig6, sig7,
         |  md5(concat_ws('|', sig0, sig1, sig2, sig3)) AS band0,
         |  md5(concat_ws('|', sig4, sig5, sig6, sig7)) AS band1
         |FROM sig ORDER BY doc_id""".stripMargin,

    "q_dedup_minhash" ->
      s"""$SIG_CTE,
         |bands AS (
         |  SELECT doc_id, 0 AS band_id, md5(concat_ws('|', sig0, sig1, sig2, sig3)) AS bkey FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band_id, md5(concat_ws('|', sig4, sig5, sig6, sig7)) AS bkey FROM sig)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Exact incremental ingest: the contract (bucket-min intra-batch +
    // index anti-join cross-batch, index = accepted docs' hashes) is
    // EXACTLY the first-(batch, doc_id)-occurrence rule per content
    // hash — on a single exact band, the first batch's bucket minimum
    // is always accepted, so every seen hash is indexed.
    "q_dedup_incremental" ->
      s"""WITH $CORPUS_SQL,
         |r AS (SELECT batch_no, doc_id,
         |    row_number() OVER (PARTITION BY md5(text)
         |      ORDER BY batch_no, doc_id) AS rn
         |  FROM corpus)
         |SELECT CAST(batch_no AS BIGINT) AS batch_no, doc_id
         |FROM r WHERE rn = 1 ORDER BY batch_no, doc_id""".stripMargin,

    // Banded near-dup incremental ingest: the per-batch acceptance
    // unrolls exactly the operator's two rules — NOT EXISTS a shared
    // band with a previously-ACCEPTED doc, NOT EXISTS a shared band
    // with a smaller-id SAME-batch doc (bucket-min; all batch docs, not
    // just accepted ones). Only signature-bearing docs (≥ 3 words)
    // participate, the signature table's own contract.
    "q_dedup_incremental_lsh" ->
      s"""WITH $CORPUS_SQL,
         |base AS (
         |  SELECT doc_id, $SHINGLES AS sh
         |  FROM (SELECT doc_id, $W AS w FROM corpus)),
         |hashed AS (
         |  SELECT doc_id, list_transform(sh,
         |    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % ${graft.llm.TextOps.MinhashP}) AS hs
         |  FROM base WHERE len(sh) >= 1),
         |sig AS (
         |  SELECT doc_id,
         |    $SIG_LINES
         |  FROM hashed),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id, md5(concat_ws('|', sig0, sig1, sig2, sig3)) AS bkey FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band_id, md5(concat_ws('|', sig4, sig5, sig6, sig7)) AS bkey FROM sig),
         |m AS (SELECT c.batch_no, c.doc_id FROM corpus c
         |  JOIN (SELECT DISTINCT doc_id FROM sig) s USING (doc_id)),
         |acc1 AS (SELECT doc_id FROM m WHERE batch_no = 1 AND NOT EXISTS (
         |    SELECT 1 FROM bands x JOIN bands y
         |      ON x.band_id = y.band_id AND x.bkey = y.bkey
         |    WHERE x.doc_id = m.doc_id AND y.doc_id < m.doc_id
         |      AND y.doc_id IN (SELECT doc_id FROM m WHERE batch_no = 1))),
         |acc2 AS (SELECT doc_id FROM m WHERE batch_no = 2
         |  AND NOT EXISTS (
         |    SELECT 1 FROM bands x JOIN bands y
         |      ON x.band_id = y.band_id AND x.bkey = y.bkey
         |    WHERE x.doc_id = m.doc_id
         |      AND y.doc_id IN (SELECT doc_id FROM acc1))
         |  AND NOT EXISTS (
         |    SELECT 1 FROM bands x JOIN bands y
         |      ON x.band_id = y.band_id AND x.bkey = y.bkey
         |    WHERE x.doc_id = m.doc_id AND y.doc_id < m.doc_id
         |      AND y.doc_id IN (SELECT doc_id FROM m WHERE batch_no = 2))),
         |acc3 AS (SELECT doc_id FROM m WHERE batch_no = 3
         |  AND NOT EXISTS (
         |    SELECT 1 FROM bands x JOIN bands y
         |      ON x.band_id = y.band_id AND x.bkey = y.bkey
         |    WHERE x.doc_id = m.doc_id
         |      AND y.doc_id IN (SELECT doc_id FROM acc1
         |                       UNION ALL SELECT doc_id FROM acc2))
         |  AND NOT EXISTS (
         |    SELECT 1 FROM bands x JOIN bands y
         |      ON x.band_id = y.band_id AND x.bkey = y.bkey
         |    WHERE x.doc_id = m.doc_id AND y.doc_id < m.doc_id
         |      AND y.doc_id IN (SELECT doc_id FROM m WHERE batch_no = 3)))
         |SELECT CAST(m.batch_no AS BIGINT) AS batch_no, m.doc_id FROM m
         |JOIN (SELECT doc_id FROM acc1 UNION ALL SELECT doc_id FROM acc2
         |      UNION ALL SELECT doc_id FROM acc3) a USING (doc_id)
         |ORDER BY batch_no, doc_id""".stripMargin,

    // Window-minima via list_slice over an index range; same base-hash
    // chain as the minhash CTE (md5 → 60-bit int → mod p).
    "q_winnow" ->
      s"""WITH base AS (
         |  SELECT doc_id, $SHINGLES AS sh
         |  FROM (SELECT doc_id, $W AS w FROM documents)),
         |hashed AS (
         |  SELECT doc_id, list_transform(sh,
         |    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % ${graft.llm.TextOps.MinhashP}) AS hs
         |  FROM base WHERE len(sh) >= 1)
         |SELECT doc_id, unnest(list_sort(list_distinct(
         |    list_transform(range(1, len(hs) - 4 + 2),
         |      i -> list_min(list_slice(hs, i, i + 3)))))) AS fp
         |FROM hashed
         |ORDER BY doc_id, fp""".stripMargin,

    // Connected components over the minhash-LSH pair set, as a recursive
    // transitive closure (min reachable doc_id = component label); docs
    // with no near-dup edge are their own singleton cluster.
    "q_dedup_clusters" ->
      s"""${SIG_CTE.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |bands AS (
         |  SELECT doc_id, 0 AS band_id, md5(concat_ws('|', sig0, sig1, sig2, sig3)) AS bkey FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band_id, md5(concat_ws('|', sig4, sig5, sig6, sig7)) AS bkey FROM sig),
         |edges AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         |reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS min_reach FROM reach GROUP BY src)
         |SELECT d.doc_id,
         |  coalesce(least(c.min_reach, d.doc_id), d.doc_id) AS cluster_id,
         |  coalesce(least(c.min_reach, d.doc_id), d.doc_id) = d.doc_id AS is_rep
         |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_corpus_mix" ->
      """WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_avail,
        |    CAST(CAST(substr(source, 4) AS INT) % 3 + 1 AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |lim AS (SELECT n_avail AS n_lim, w AS w_lim FROM a
        |  ORDER BY CAST(n_avail AS DOUBLE) / w, source LIMIT 1),
        |t AS (SELECT source, n_avail, w,
        |    (w * n_lim) // w_lim AS n_target,
        |    (1000 * ((w * n_lim) // w_lim)) // n_avail AS thresh
        |  FROM a CROSS JOIN lim),
        |k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept
        |  FROM documents d JOIN t USING (source)
        |  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 1000
        |    < thresh
        |  GROUP BY source)
        |SELECT source, n_avail, w, n_target,
        |  coalesce(n_kept, CAST(0 AS BIGINT)) AS n_kept
        |FROM t LEFT JOIN k USING (source) ORDER BY source""".stripMargin,

    "q_corpus_mix_temp" ->
      """WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_avail,
        |    CAST(floor(sqrt(count(*))) AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS sum_w,
        |    CAST(sum(n_avail) AS BIGINT) // 2 AS budget FROM a),
        |t AS (SELECT source, n_avail, w,
        |    least(n_avail, (budget * w) // sum_w) AS n_target,
        |    (1000 * least(n_avail, (budget * w) // sum_w)) // n_avail AS thresh
        |  FROM a CROSS JOIN tot),
        |k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept
        |  FROM documents d JOIN t USING (source)
        |  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 1000
        |    < thresh
        |  GROUP BY source)
        |SELECT source, n_avail, w, n_target,
        |  coalesce(n_kept, CAST(0 AS BIGINT)) AS n_kept
        |FROM t LEFT JOIN k USING (source) ORDER BY source""".stripMargin,

    // same banded edges, endpoints joined to their sources
    "q_source_overlap" ->
      s"""$SIG_CTE,
         |bands AS (
         |  SELECT doc_id, 0 AS band_id, md5(concat_ws('|', sig0, sig1, sig2, sig3)) AS bkey FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band_id, md5(concat_ws('|', sig4, sig5, sig6, sig7)) AS bkey FROM sig),
         |edges AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT least(da.source, db.source) AS source_a,
         |  greatest(da.source, db.source) AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM edges
         |  JOIN documents da ON da.doc_id = a
         |  JOIN documents db ON db.doc_id = b
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same transitive-closure labels, then the highest-quality member
    // (token count, ties to lowest doc_id) per cluster is kept
    "q_dedup_keep_best" ->
      s"""${SIG_CTE.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |bands AS (
         |  SELECT doc_id, 0 AS band_id, md5(concat_ws('|', sig0, sig1, sig2, sig3)) AS bkey FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band_id, md5(concat_ws('|', sig4, sig5, sig6, sig7)) AS bkey FROM sig),
         |edges AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         |reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS min_reach FROM reach GROUP BY src),
         |labeled AS (SELECT d.doc_id,
         |    coalesce(least(c.min_reach, d.doc_id), d.doc_id) AS cluster_id,
         |    CAST(len($W) AS BIGINT) AS quality
         |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
         |r AS (SELECT doc_id, cluster_id, quality, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rn
         |  FROM labeled)
         |SELECT doc_id, cluster_id, quality, rn = 1 AS keep
         |FROM r ORDER BY doc_id""".stripMargin,

    "q_hybrid_rrf" ->
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |ex0 AS (SELECT vec_id,
        |    list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))) AS score
        |  FROM embeddings e, q WHERE vec_id <> 0
        |  ORDER BY score DESC, vec_id LIMIT 20),
        |exr AS (SELECT vec_id,
        |    row_number() OVER (ORDER BY score DESC, vec_id) AS r FROM ex0),
        |sc AS (SELECT vec_id,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
        |      AS scale, embedding
        |  FROM embeddings),
        |codes AS (SELECT vec_id, scale,
        |    list_transform(embedding::DOUBLE[], x -> floor(x / scale + 0.5))
        |      AS code
        |  FROM sc),
        |ap0 AS (SELECT a.vec_id,
        |    list_dot_product(a.code, qc.code) * a.scale * qc.scale AS score
        |  FROM codes a, (SELECT scale, code FROM codes WHERE vec_id = 0) qc
        |  WHERE a.vec_id <> 0 ORDER BY score DESC, a.vec_id LIMIT 20),
        |apr AS (SELECT vec_id,
        |    row_number() OVER (ORDER BY score DESC, vec_id) AS r FROM ap0),
        |u AS (SELECT * FROM exr UNION ALL SELECT * FROM apr)
        |SELECT vec_id,
        |  CAST(floor(sum(1.0/(60 + r)) * 1e6 + 0.5) AS BIGINT) AS rrf_1e6,
        |  CAST(count(*) AS BIGINT) AS n_lists
        |FROM u GROUP BY vec_id
        |ORDER BY rrf_1e6 DESC, vec_id LIMIT 10""".stripMargin,

    "q_ann_sq8" ->
      """WITH sc AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale,
        |    embedding
        |  FROM embeddings),
        |codes AS (
        |  SELECT vec_id, scale,
        |    list_transform(embedding::DOUBLE[], x -> floor(x / scale + 0.5)) AS code
        |  FROM sc)
        |SELECT a.vec_id,
        |  list_dot_product(a.code, q.code) * a.scale * q.scale AS approx_dot
        |FROM codes a, (SELECT scale, code FROM codes WHERE vec_id = 0) q
        |WHERE a.vec_id != 0
        |ORDER BY approx_dot DESC, a.vec_id
        |LIMIT 10""".stripMargin,

    "q_dedup_simhash" -> {
      val sums = (1 to 16).map(j =>
        s"sum(CASE WHEN substr(md5(tok), $j, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b$j")
        .mkString(",\n    ")
      val bits = (1 to 16).map(j => s"(CASE WHEN b$j > 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($W) AS tok FROM documents),
         |agg AS (
         |  SELECT doc_id,
         |    $sums
         |  FROM toks GROUP BY doc_id)
         |SELECT doc_id, $bits AS simhash,
         |  substr($bits, 1, 8) AS sim_bucket
         |FROM agg ORDER BY doc_id""".stripMargin
    },

    "q_simhash_pairs" -> {
      val sums = (1 to 16).map(j =>
        s"sum(CASE WHEN substr(md5(tok), $j, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b$j")
        .mkString(",\n    ")
      val bits = (1 to 16).map(j => s"(CASE WHEN b$j > 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      val hamming = "(CASE WHEN substr(a.simhash, 1, 1) <> substr(b.simhash, 1, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 2, 1) <> substr(b.simhash, 2, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 3, 1) <> substr(b.simhash, 3, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 4, 1) <> substr(b.simhash, 4, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 5, 1) <> substr(b.simhash, 5, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 6, 1) <> substr(b.simhash, 6, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 7, 1) <> substr(b.simhash, 7, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 8, 1) <> substr(b.simhash, 8, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 9, 1) <> substr(b.simhash, 9, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 10, 1) <> substr(b.simhash, 10, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 11, 1) <> substr(b.simhash, 11, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 12, 1) <> substr(b.simhash, 12, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 13, 1) <> substr(b.simhash, 13, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 14, 1) <> substr(b.simhash, 14, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 15, 1) <> substr(b.simhash, 15, 1) THEN 1 ELSE 0 END) + (CASE WHEN substr(a.simhash, 16, 1) <> substr(b.simhash, 16, 1) THEN 1 ELSE 0 END)"
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($W) AS tok FROM documents),
         |agg AS (
         |  SELECT doc_id,
         |    $sums
         |  FROM toks GROUP BY doc_id),
         |h AS (
         |  SELECT doc_id, $bits AS simhash, substr($bits, 1, 8) AS sim_bucket
         |  FROM agg)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  $hamming AS hamming_dist
         |FROM h a JOIN h b ON a.sim_bucket = b.sim_bucket AND a.doc_id < b.doc_id
         |WHERE $hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "q_simhash64" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($W) AS tok FROM documents),
         |agg AS (
         |  SELECT doc_id,
         |    $SIM64_SUMS
         |  FROM toks GROUP BY doc_id)
         |SELECT doc_id, $SIM64_BITS AS simhash64,
         |  substr($SIM64_BITS, 1, 16) AS band0,
         |  substr($SIM64_BITS, 17, 16) AS band1,
         |  substr($SIM64_BITS, 33, 16) AS band2,
         |  substr($SIM64_BITS, 49, 16) AS band3
         |FROM agg ORDER BY doc_id""".stripMargin,

    "q_simhash64_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($W) AS tok FROM documents),
         |agg AS (
         |  SELECT doc_id,
         |    $SIM64_SUMS
         |  FROM toks GROUP BY doc_id),
         |h AS (SELECT doc_id, $SIM64_BITS AS sh FROM agg),
         |bands AS (
         |  SELECT doc_id, sh, 0 AS band_id, substr(sh, 1, 16) AS bkey FROM h UNION ALL
         |  SELECT doc_id, sh, 1, substr(sh, 17, 16) FROM h UNION ALL
         |  SELECT doc_id, sh, 2, substr(sh, 33, 16) FROM h UNION ALL
         |  SELECT doc_id, sh, 3, substr(sh, 49, 16) FROM h)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(hamming(a.sh, b.sh) AS INTEGER) AS hamming_dist
         |FROM bands a JOIN bands b
         |  ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |WHERE hamming(a.sh, b.sh) <= 8
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_ngram_jaccard" ->
      s"""$SIG_CTE,
         |bands AS (
         |  SELECT doc_id, 0 AS band_id, md5(concat_ws('|', sig0, sig1, sig2, sig3)) AS bkey FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band_id, md5(concat_ws('|', sig4, sig5, sig6, sig7)) AS bkey FROM sig),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band_id = y.band_id AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |d AS (SELECT doc_id, list_distinct($W) AS ts FROM documents)
         |SELECT c.doc_a, c.doc_b,
         |  CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS n_common,
         |  CAST(len(list_distinct(list_cat(a.ts, b.ts))) AS BIGINT) AS n_union,
         |  len(list_intersect(a.ts, b.ts)) /
         |    CAST(len(list_distinct(list_cat(a.ts, b.ts))) AS DOUBLE) AS jaccard_sim
         |FROM cand c JOIN d a ON a.doc_id = c.doc_a JOIN d b ON b.doc_id = c.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($W) AS token FROM documents),
         |tf AS (
         |  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (
         |  SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         |    tf.tf * ln(n.n_docs / dfreq.df) AS score_raw
         |  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
         |SELECT doc_id, token AS top_term, tf, df,
         |  floor(score_raw * 1e4 + 0.5) / 1e4 AS tfidf
         |FROM scored
         |QUALIFY row_number() OVER (PARTITION BY doc_id
         |  ORDER BY score_raw DESC, token) = 1
         |ORDER BY doc_id""".stripMargin,

    // BM25 = the same arithmetic in the same association order (the
    // per-term integer scaling makes the per-doc sum exact either way).
    "q_bm25" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($W) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |  avg(dl) AS avgdl FROM dl),
         |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |qterms AS (SELECT token FROM (
         |  SELECT token, count(*) AS n FROM toks GROUP BY 1
         |  ORDER BY n DESC, token LIMIT 3)),
         |scored AS (
         |  SELECT tf.doc_id,
         |    CAST(floor(
         |      ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0) *
         |      (tf.tf * 2.2) /
         |      (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) *
         |      1e4 + 0.5) AS BIGINT) AS s_scaled
         |  FROM tf JOIN qterms USING (token) JOIN dfreq USING (token)
         |    JOIN dl USING (doc_id) CROSS JOIN stats)
         |SELECT doc_id, CAST(sum(s_scaled) AS BIGINT) AS bm25_1e4,
         |  CAST(count(*) AS BIGINT) AS n_terms
         |FROM scored GROUP BY doc_id
         |ORDER BY bm25_1e4 DESC, doc_id LIMIT 20""".stripMargin,

    "q_split_assign" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 800 THEN 'train'
        |  WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, doc_id, CAST(rn AS INT) AS rn FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,

    "q_top_terms" ->
      s"""SELECT token, count(*) AS freq
         |FROM (SELECT unnest($W) AS token FROM documents)
         |GROUP BY token ORDER BY freq DESC, token LIMIT 20""".stripMargin,

    "q_embed_pairs" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY vec_a""".stripMargin,

    // full-probe IVF == brute force (the lists partition the corpus):
    // same CTE-free shape as q_ann_bruteforce, top-5, no label column
    "q_ann_ivf_kmpp" ->
      """SELECT e.vec_id,
        |  list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))) AS cos_sim
        |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cos_sim DESC, e.vec_id LIMIT 5""".stripMargin,

    "q_ann_bruteforce" ->
      """SELECT e.vec_id, e.label,
        |  list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))) AS cos_sim
        |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin,

    "q_ann_lsh" -> {
      def bucket(tbl: String) = (1 to 8).map(i =>
        s"(CASE WHEN $tbl.embedding[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
      s"""SELECT e.vec_id, ${bucket("e")} AS bucket,
         |  list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
         |    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
         |     sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))) AS cos_sim
         |FROM embeddings e
         |JOIN (SELECT embedding, ${bucket("embeddings")} AS qb
         |      FROM embeddings WHERE vec_id = 0) q
         |  ON ${bucket("e")} = q.qb
         |WHERE e.vec_id <> 0
         |ORDER BY cos_sim DESC, e.vec_id LIMIT 5""".stripMargin
    },

    "q_dedup_embedding" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos_sim
        |FROM embeddings a JOIN embeddings b
        |  ON (CASE WHEN a.embedding[1] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN a.embedding[2] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN a.embedding[3] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN a.embedding[4] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN a.embedding[5] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN a.embedding[6] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN a.embedding[7] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN a.embedding[8] >= 0 THEN '1' ELSE '0' END) =
        |     (CASE WHEN b.embedding[1] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN b.embedding[2] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN b.embedding[3] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN b.embedding[4] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN b.embedding[5] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN b.embedding[6] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN b.embedding[7] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN b.embedding[8] >= 0 THEN '1' ELSE '0' END)
        |  AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) > 0.25
        |ORDER BY vec_a, vec_b""".stripMargin,

    "q_dedup_embedding_mt" -> {
      val unions = (0 until 4).map(t =>
        s"""SELECT vec_id, embedding, $t AS tbl,
           |    ${srpBucketSql("embeddings", t * 16 + 1)} AS bucket FROM embeddings""".stripMargin)
        .mkString("\n  UNION ALL\n  ")
      s"""WITH bk AS (
         |  $unions)
         |SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  $CosSql AS cos_sim
         |FROM bk a JOIN bk b
         |  ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE $CosSql > 0.0
         |ORDER BY vec_a, vec_b""".stripMargin
    },

    "q_ann_ivf" -> IvfSql,

    "q_ann_pq" -> PqSql,

    "q_ann_ivfpq" -> IvfPqSql,

    // identical SQL: the persisted partitioned code layout must return
    // exactly what the inline composition returns
    "q_ann_ivfpq_persisted" -> IvfPqSql,

    // identical SQL: the persisted partitioned layout must return exactly
    // what the inline IVF computation returns
    "q_ann_ivf_persisted" -> IvfSql,

    // unnest(range(...)) instead of a lateral generate_series table call:
    // DuckDB's table-function form rejects column parameters ("does not
    // support lateral join column parameters"); the scalar list form allows
    // them and range's exclusive stop == generate_series' stop-1 here.
    "q_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text AS media,
        |         CAST(length(text) // 32 AS INTEGER) AS n_frames
        |  FROM documents),
        |s AS (
        |  SELECT *, GREATEST(1, CAST((n_frames + 7) // 8 AS INTEGER)) AS stride
        |  FROM f WHERE n_frames > 0),
        |u AS (
        |  SELECT doc_id, n_frames, stride, media,
        |         unnest(range(0, CAST(n_frames AS BIGINT), CAST(stride AS BIGINT))) AS i
        |  FROM s)
        |SELECT doc_id, n_frames,
        |  CAST(i // stride AS INTEGER) AS frame_idx,
        |  md5(substring(media, CAST(i*32+1 AS BIGINT), 32)) AS frame_md5
        |FROM u
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id AS id, 'text/plain' AS mime_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY id""".stripMargin)

  /** cos(a, b) over arbitrary SQL vector expressions. */
  private[graft] def cosOf(a: String, b: String): String =
    s"""list_dot_product($a::DOUBLE[], $b::DOUBLE[]) /
       |    (sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) *
       |     sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[])))""".stripMargin

  /** One Lloyd round as CTEs: assign every vector to its nearest centroid
    * from `prevCents`, then rebuild centroids as per-dimension
    * DECIMAL(38,18) member sums (exact and order-insensitive — matches
    * KMeans.train bit-for-bit; cosine is scale-invariant so the sum is
    * the mean's direction). */
  private def lloydRoundSql(i: Int, prevCents: String): String =
    s"""assign$i AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id
       |  FROM embeddings e CROSS JOIN $prevCents c
       |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY ${cosOf("e.embedding", "c.cvec")} DESC, c.cent_id) = 1),
       |cents$i AS (
       |  SELECT cent_id, list(sval ORDER BY dim) AS cvec FROM (
       |    SELECT a.cent_id, d.dim,
       |      CAST(SUM(CAST(a.embedding[d.dim] AS DECIMAL(38,18))) AS DOUBLE) AS sval
       |    FROM assign$i a CROSS JOIN (SELECT unnest(range(1, 65)) AS dim) d
       |    GROUP BY a.cent_id, d.dim)
       |  GROUP BY cent_id)""".stripMargin

  /** The IVF CTE block (trained centroids → inverted lists → probes);
    * shared by the IVF oracle and the IVF-PQ composition. */
  private[graft] lazy val IvfCtes =
      s"""cents_init AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |${lloydRoundSql(1, "cents_init")},
        |${lloydRoundSql(2, "cents1")},
        |scored AS (
        |  SELECT e.vec_id, e.embedding, c.cent_id,
        |    ${cosOf("e.embedding", "c.cvec")} AS cos_c
        |  FROM embeddings e CROSS JOIN cents2 c),
        |ivf AS (
        |  SELECT vec_id, embedding, cent_id FROM scored
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cent_id) = 1),
        |probes AS (
        |  SELECT cent_id FROM scored WHERE vec_id = 0
        |  ORDER BY cos_c DESC, cent_id LIMIT 2),
        |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)""".stripMargin

  private lazy val IvfSql =
      s"""WITH $IvfCtes
        |SELECT i.vec_id, i.cent_id,
        |  ${cosOf("i.embedding", "qvec")} AS cos_sim
        |FROM ivf i JOIN probes p ON i.cent_id = p.cent_id CROSS JOIN q
        |WHERE i.vec_id <> 0
        |ORDER BY cos_sim DESC, i.vec_id LIMIT 5""".stripMargin

  /** One PQ Lloyd round over the fixed-point sub-vectors: L2 assignment
    * via argmax(2·dot − ‖c‖²) — exact integers held in doubles — then
    * mean update re-gridded with floor(s/n + 0.5) (one IEEE division of
    * exact integers; identical in any engine). */
  private def pqRoundSql(i: Int, prevCb: String): String =
    s"""pqassign$i AS (
       |  SELECT s.vec_id, s.m, s.sub, c.cent_id
       |  FROM pqsubs s JOIN $prevCb c ON s.m = c.m
       |  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.m
       |    ORDER BY (2.0 * list_dot_product(s.sub, c.cvec)
       |      - list_dot_product(c.cvec, c.cvec)) DESC, c.cent_id) = 1),
       |cb$i AS (
       |  SELECT m, cent_id, list(mv ORDER BY dim) AS cvec FROM (
       |    SELECT a.m, a.cent_id, d.dim,
       |      FLOOR(SUM(a.sub[d.dim]) / COUNT(*) + 0.5) AS mv
       |    FROM pqassign$i a CROSS JOIN (SELECT unnest(range(1, 17)) AS dim) d
       |    GROUP BY a.m, a.cent_id, d.dim)
       |  GROUP BY m, cent_id)""".stripMargin

  /** The PQ CTE block (fixed-point sub-vectors → trained codebooks →
    * code table → ADC lookup table); shared by the PQ oracle and the
    * IVF-PQ composition. */
  private lazy val PqCtes = {
    val subSelects = (0 until 4).map(m =>
      s"""SELECT vec_id, $m AS m,
         |    list_transform(embedding[${m * 16 + 1}:${(m + 1) * 16}],
         |      x -> FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5)) AS sub
         |  FROM embeddings""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    s"""pqsubs AS (
       |  $subSelects),
       |cb0 AS (SELECT m, vec_id AS cent_id, sub AS cvec FROM pqsubs WHERE vec_id < 16),
       |${pqRoundSql(1, "cb0")},
       |${pqRoundSql(2, "cb1")},
       |enc AS (
       |  SELECT s.vec_id, s.m, c.cent_id AS code
       |  FROM pqsubs s JOIN cb2 c ON s.m = c.m
       |  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.m
       |    ORDER BY (2.0 * list_dot_product(s.sub, c.cvec)
       |      - list_dot_product(c.cvec, c.cvec)) DESC, c.cent_id) = 1),
       |qsub AS (SELECT m, sub AS qsub FROM pqsubs WHERE vec_id = 0),
       |lut AS (
       |  SELECT c.m, c.cent_id AS code,
       |    list_dot_product(q.qsub, c.cvec) AS part
       |  FROM cb2 c JOIN qsub q ON c.m = q.m)""".stripMargin
  }

  // lazy: referenced from lazy SQL vals that the eager `oracle` map
  // forces during object init, before plain vals below it would be set
  private lazy val PqCodeCols =
    (0 until 4).map(i => s"MAX(CASE WHEN e.m = $i THEN e.code END) AS code$i")
  private lazy val PqPartCols =
    (0 until 4).map(i => s"MAX(CASE WHEN e.m = $i THEN l.part END) AS part$i")

  private lazy val PqSql =
    s"""WITH $PqCtes,
       |agg AS (
       |  SELECT e.vec_id,
       |    ${PqCodeCols.mkString(",\n    ")},
       |    ${PqPartCols.mkString(",\n    ")}
       |  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.code
       |  GROUP BY e.vec_id)
       |SELECT vec_id, code0, code1, code2, code3,
       |  (((part0 + part1) + part2) + part3) / 1099511627776.0 AS approx_dot
       |FROM agg WHERE vec_id <> 0
       |ORDER BY approx_dot DESC, vec_id LIMIT 10""".stripMargin

  /** IVF-PQ composition (the FAISS IVFPQ layout, minus residual
    * encoding): probe the IVF lists, ADC-score ONLY the probed lists'
    * code rows. At 100 TB the code table is written partitioned by
    * cent_id like the IVF index, so a query reads nprobe partitions of a
    * 16×-compressed table — the probe cost is
    * corpus · nprobe/centroids ÷ 16 versus brute force. */
  private lazy val IvfPqSql =
    s"""WITH $IvfCtes,
       |$PqCtes,
       |pv AS (
       |  SELECT i.vec_id, i.cent_id FROM ivf i JOIN probes p ON i.cent_id = p.cent_id),
       |agg AS (
       |  SELECT e.vec_id,
       |    ${PqPartCols.mkString(",\n    ")}
       |  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.code
       |  JOIN pv ON e.vec_id = pv.vec_id
       |  GROUP BY e.vec_id)
       |SELECT a.vec_id, pv.cent_id,
       |  (((part0 + part1) + part2) + part3) / 1099511627776.0 AS approx_dot
       |FROM agg a JOIN pv ON a.vec_id = pv.vec_id
       |WHERE a.vec_id <> 0
       |ORDER BY approx_dot DESC, a.vec_id LIMIT 10""".stripMargin
}
