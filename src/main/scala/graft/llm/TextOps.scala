package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for a large-scale training-data
  * pipeline, composed from codegen'd built-ins (no UDFs — every expression
  * stays inside whole-stage codegen; SURVEY.md §7 extension goals).
  *
  * Scale design: all ops are per-row expressions or single
  * explode→hash-aggregate passes (map-side combined). MinHash/SimHash avoid
  * the O(n²) pair space: LSH banding reduces candidate generation to an
  * equi-join on band keys — the standard shingle→minhash→band→bucket-join
  * pipeline (Broder 1997 resemblance sketches / Leskovec et al. MMDS ch.3).
  * Cross-engine hashing uses md5 (identical hex in Spark and DuckDB), never
  * engine-private hash functions.
  */
object TextOps {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** n-word shingles: ["a","b","c","d"], n=3 → ["a b c","b c d"].
    * Empty array when the document is shorter than n words.
    *
    * Built from n shifted slices zipped element-wise — NOT from a
    * transform over indices with `element_at(words, i+k)`: a lambda that
    * CAPTURES `words` re-evaluates the captured expression once per
    * element, so with words = split(text) the full regex tokenization
    * would re-run n times per shingle (measured: ~20s at sf0.1 vs <1s for
    * this form). zip_with/slice evaluate their array children once per
    * row. */
  def shingles(words: Column, n: Int): Column = {
    val m = size(words) - lit(n - 1) // shingle count when positive
    val slices = (0 until n).map(k => slice(words, lit(k + 1), greatest(m, lit(0))))
    val zipped = slices.reduce((acc, next) =>
      zip_with(acc, next, (a, b) => concat(a, lit(" "), b)))
    when(size(words) >= n, zipped).otherwise(array().cast("array<string>"))
  }

  /** MinHash family: hash each shingle ONCE (md5 → 60-bit int → mod p),
    * then derive the k-th hash function as the linear congruence
    * (a_k·h + b_k) mod p — the standard universal-hash trick, so one
    * expensive digest serves all k signatures. p = 2^31−1 keeps a_k·h
    * < 2^62 (no BIGINT overflow in either engine). Everything is a PURE
    * PROJECTION (array_min ∘ transform): no explode, no shuffle — at
    * 100 TB the signature stage is embarrassingly parallel map work. */
  val MinhashP = 2147483647L
  val MinhashCoeffs: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (1100000017L, 98765L), (1048576013L, 54321L),
    (1000000007L, 13579L), (999999937L, 24680L), (899999963L, 11111L),
    (799999999L, 77777L), (699999953L, 31415L))

  /** Per-shingle base hashes: md5 → top 60 bits → mod p, computed once.
    * Native kernel ([[graft.functions.MinhashBaseHashes]]) — no hex
    * string materialization/re-parse per shingle; bit-identical to
    * [[shingleHashesHof]] (parity asserted in LlmSpec). */
  def shingleHashes(shingleArr: Column): Column =
    org.apache.spark.sql.graft.NativeColumns.minhashBaseHashes(shingleArr, MinhashP)

  /** HOF reference formulation of the base hash (executable spec for the
    * native kernel; mirrors the DuckDB oracle expression verbatim). */
  def shingleHashesHof(shingleArr: Column): Column =
    transform(shingleArr, sh =>
      conv(substring(md5(sh), 1, 15), 16, 10).cast("long") % MinhashP)

  /** k-th MinHash signature over the precomputed base-hash array. */
  def minhashSig(hashArr: Column, k: Int): Column = {
    val (a, b) = MinhashCoeffs(k)
    array_min(transform(hashArr, h => (h * a + b) % MinhashP))
  }

  /** LSH band key: hash of a contiguous slice of the signature columns.
    * Documents sharing any band key are near-duplicate candidates. */
  def bandKey(sigs: Seq[Column]): Column = md5(concat_ws("|", sigs: _*))

  /** Per-token md5 array — hash each token ONCE, then derive all 16 SimHash
    * bits from the cached hex (16× fewer md5 calls than hashing per bit). */
  def tokenHashes(words: Column): Column = transform(words, t => md5(t))

  /** 16-bit SimHash: bit j = sign of Σ(±1 per token, + when the j-th hex
    * nibble of the token's md5 has its high bit set). Native codegen'd
    * kernel ([[graft.functions.SimHashBits]]); bit-identical to
    * [[simhashFromHashesHof]] (parity asserted in LlmSpec). */
  def simhashFromHashes(hashArr: Column, bits: Int = 16): Column =
    org.apache.spark.sql.graft.NativeColumns.simhashBits(hashArr, bits)

  /** HOF reference formulation of the 16-bit SimHash (pure built-ins:
    * aggregate over the hash array per bit). Kept as the executable spec
    * the native kernel is tested against; the native form exists because
    * per-bit expression trees generate code too large to JIT well. */
  def simhashFromHashesHof(hashArr: Column, bits: Int = 16): Column =
    concat((1 to bits).map { j =>
      val s = aggregate(hashArr, lit(0), (acc, h) =>
        acc + when(substring(h, j, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
      when(s > 0, "1").otherwise("0")
    }: _*)

  private val HexHighBit = Seq("8", "9", "a", "b", "c", "d", "e", "f")
  private val HexSecondBit = Seq("4", "5", "6", "7", "c", "d", "e", "f")

  /** 64-bit SimHash — the corpus-scale fingerprint (the 16-bit variant
    * above caps the LSH space at 256 buckets, so candidate pairs grow
    * O(n²/256); 64 bits with 4×16-bit bands keeps each band's bucket
    * space at 2^16 and the hamming test at full precision — the standard
    * Manku/Jain/Sarma web-dedup configuration).
    *
    * Two bits per md5 hex char (high bit + second bit of each nibble), so
    * one digest per token serves all 64 bit positions. Native codegen'd
    * kernel ([[graft.functions.SimHashBits]]): the HOF fold below
    * ([[simhash64FromHashesHof]]) generates a 64-wide zip_with whose
    * bytecode is too large for HotSpot to promote past C1 — measured ~10s
    * cold vs ~1s native at sf0.1. Parity asserted in LlmSpec. */
  def simhash64FromHashes(hashArr: Column): Column =
    org.apache.spark.sql.graft.NativeColumns.simhashBits(hashArr, 64)

  /** HOF reference formulation (executable spec for the native kernel):
    * ONE fold over the token-hash array with a 64-counter accumulator. */
  def simhash64FromHashesHof(hashArr: Column): Column =
    aggregate(
      hashArr,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, array((1 to 64).map { j =>
        val nib = substring(h, (j + 1) / 2, 1)
        val ones = if (j % 2 == 1) HexHighBit else HexSecondBit
        when(nib.isin(ones: _*), 1).otherwise(-1)
      }: _*), (a, c) => a + c),
      acc => array_join(transform(acc, s => when(s > 0, "1").otherwise("0")), ""))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS local-similarity sketch): slide a window of `w` consecutive
    * k-gram hashes and keep each window's minimum; the distinct minima are
    * the document's fingerprints. Guarantees any shared run of ≥ w+k-1
    * tokens produces a shared fingerprint — position-sensitive, unlike
    * MinHash's whole-document resemblance. Built from w shifted slices
    * zipped with least() (same no-capture construction as [[shingles]]:
    * the hash-array child evaluates once per row, not once per element).
    * Sorted distinct output for deterministic downstream joins. */
  def winnowFingerprints(hashArr: Column, w: Int): Column = {
    val m = size(hashArr) - lit(w - 1) // window count when positive
    val slices = (0 until w).map(k => slice(hashArr, lit(k + 1), greatest(m, lit(0))))
    val mins = slices.reduce((a, b) => zip_with(a, b, (x, y) => least(x, y)))
    array_sort(array_distinct(
      when(size(hashArr) >= w, mins).otherwise(array().cast("array<long>"))))
  }

  /** Deterministic [0,1000) bucket from a key — md5-based so the split is
    * stable across runs, engines, partitionings, and cluster sizes (the
    * property a train/val/test split MUST have; rand()-based sampling has
    * none of them). Portable: DuckDB computes the identical bucket. */
  def hashBucket1000(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 1000L

  /** Exact-duplicate cluster key: md5 of the raw text. */
  def exactKey(text: Column): Column = md5(text)

  /** Canonical text normalization for dedup (the C4/RefinedWeb-style
    * preprocessing step): lowercase, strip punctuation/symbols, collapse
    * whitespace, trim. Exact-dedup on the normalized form catches
    * case/punctuation/spacing variants that byte-exact keys miss.
    *
    * Character classes are chosen for EXACT cross-engine agreement:
    * `\p{L}\p{N}` (Unicode letters/digits — identical in Java regex and
    * RE2, and non-ASCII text is KEPT, not deleted: two unrelated CJK
    * docs must not collapse to md5('')), and an explicit whitespace
    * class `[\t\n\f\r ]` instead of `\s` (Java's `\s` includes vertical
    * tab \x0B, RE2's does not — with the explicit class both engines
    * delete \x0B via the punctuation rule). Parity verified against
    * DuckDB on case/punctuation/CJK/control fixtures (LlmSpec). */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\t\\n\\f\\r ]", ""),
      "[\\t\\n\\f\\r ]+", " "))

  /** Exact-dup key over the normalized form. */
  def normalizedKey(text: Column): Column = exactKey(normalize(text))

  /** PII patterns for [[redactPii]] — the standard pre-training scrub
    * (emails, North-American phone shapes, IPv4). Every pattern stays
    * in the RE2-compatible subset (character classes, bounded
    * quantifiers, `\b` word boundaries — no backreferences or
    * lookaround), so Java regex and DuckDB/RE2 match byte-for-byte and
    * the scrub is oracle-checkable. Order matters and is fixed by
    * [[redactPii]]: emails first (an address contains dots and digits
    * that the later patterns could bite mid-token), then IPv4, then
    * phones. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email",
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "<IP>"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"))

  /** PII redaction over a text column: every match replaced by its
    * category tag, plus per-category match counts (counted BEFORE any
    * replacement, on the original text — a later pattern must not
    * count or miss inside an earlier tag). Pure per-row expressions —
    * codegen'd, no shuffle, no UDF; at 100 TB this runs at scan speed
    * inside whatever stage reads the text. */
  def redactPii(df: org.apache.spark.sql.DataFrame,
                textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val counted = piiPatterns.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name",
        regexp_count(col(textCol), lit(pat)).cast("long"))
    }
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, tag)) => regexp_replace(c, pat, tag)
    }
    counted.withColumn("redacted", redacted)
  }

  /** Order-insensitive bag fingerprint: md5 over the sorted distinct token
    * set — catches word-order permutations that exactKey misses. */
  def bagFingerprint(words: Column): Column =
    md5(array_join(array_sort(array_distinct(words)), " "))

  /** Token-set Jaccard similarity between two pre-deduplicated token
    * arrays. Integer-count division → bit-identical across engines. */
  def jaccard(aSet: Column, bSet: Column): Column =
    size(array_intersect(aSet, bSet)).cast("double") /
      size(array_union(aSet, bSet)).cast("double")

  /** Language-ID by stopword-marker scoring: count of marker-word hits per
    * language via padded LIKE (engine-portable, no regex dialect issues).
    * `markers` maps language code → marker words. Highest score wins;
    * deterministic precedence = iteration order of `markers`. */
  def langScores(text: Column, markers: Seq[(String, Seq[String])]): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    markers.map { case (lang, words) =>
      lang -> words.map(w =>
        when(padded.like(s"% $w %"), 1).otherwise(0)).reduce(_ + _)
    }
  }

  def langPredict(scores: Seq[(String, Column)]): Column = {
    // first language (in declared order) achieving the max score
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.tail.foldLeft(when(scores.head._2 === maxScore, scores.head._1)) {
      case (acc, (lang, sc)) => acc.when(sc === maxScore, lang)
    }.otherwise("und")
  }

  /** Quality-scoring feature battery (length, token stats, stopword ratio,
    * uppercase/digit ratios) — all codegen'd per-row expressions. */
  def qualityFeatures(text: Column, stopwords: Seq[String]): Map[String, Column] = {
    val w = tokens(text)
    val nTok = size(w).cast("long")
    val nChars = length(text).cast("long")
    Map(
      "n_chars" -> nChars,
      "n_tokens" -> nTok,
      "avg_token_len" ->
        (length(regexp_replace(text, "\\s+", "")).cast("double") / nTok.cast("double")),
      "stopword_ratio" ->
        (size(filter(w, x => x.isin(stopwords.map(lit): _*))).cast("double") / nTok.cast("double")),
      "distinct_ratio" ->
        (size(array_distinct(w)).cast("double") / nTok.cast("double")))
  }

  /** BPE-ish subword count proxy: words + extra tokens for digit runs and
    * long words (every 4 chars beyond 4 adds a token) — a deterministic,
    * portable stand-in for a real tokenizer's token count. */
  def tokenCountBpeIsh(text: Column): Column = {
    val w = tokens(text)
    (size(w).cast("long") +
      aggregate(w, lit(0L), (acc, x) =>
        acc + greatest(ceil(length(x).cast("double") / 4.0).cast("long") - 1L, lit(0L))))
  }
}
