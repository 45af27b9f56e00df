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
    * Empty array when the document is shorter than n words. */
  def shingles(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", (1 to n).map(k => element_at(words, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** One MinHash signature: min over shingles of md5(seed || '_' || shingle).
    * Lexicographic min over hex strings is a valid uniform min-hash and is
    * engine-portable (md5 hex identical everywhere). Use as an aggregate
    * after exploding shingles — k seeds become k agg columns in ONE pass. */
  def minhashAgg(shingle: Column, seed: Int): Column =
    min(md5(concat(lit(s"${seed}_"), shingle)))

  /** LSH band key: hash of a contiguous slice of the signature columns.
    * Documents sharing any band key are near-duplicate candidates. */
  def bandKey(sigs: Seq[Column]): Column = md5(concat_ws("|", sigs: _*))

  /** SimHash bit-sum for hex position `j` (1-based, 1..16): +1 when the
    * j-th md5 nibble of the token has its high bit set, else -1. Summed per
    * document; the sign of the sum is bit j of the 16-bit SimHash. */
  def simhashBitAgg(token: Column, j: Int): Column =
    sum(when(substring(md5(token), j, 1)
      .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))

  /** Collapse the 16 bit-sums into the SimHash bit string. */
  def simhashBits(bitSums: Seq[Column]): Column =
    concat(bitSums.map(s => when(s > 0, "1").otherwise("0")): _*)

  /** Exact-duplicate cluster key: md5 of the raw text. */
  def exactKey(text: Column): Column = md5(text)

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
