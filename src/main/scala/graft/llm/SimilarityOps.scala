package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`), built from
  * codegen'd higher-order functions — no UDFs, no driver-side math.
  *
  * Scale path: brute-force top-k is O(n·d) per query — fine for one query
  * vector (a single pass), wrong for all-pairs. The bucketed variant
  * implements sign-random-projection LSH (Charikar 2002): vectors hash to a
  * sign-bit bucket; candidate search touches only the query's bucket, i.e.
  * an equi-join on the bucket key that Spark executes as a hash join with
  * partition pruning of the candidate space. At 100 TB, bucket the corpus
  * once (write partitioned by bucket) and each query reads one partition.
  *
  * Float elements are cast to double BEFORE multiplication; the fold is
  * sequential left-to-right — the same op order DuckDB's list_dot_product
  * uses, so oracle comparisons are bit-identical.
  */
object SimilarityOps {

  /** Σ aᵢ·bᵢ with exact float→double widening, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-random-projection LSH bucket over the first `bits` axis
    * directions: bit i = sign(vᵢ). Axis-aligned hyperplanes keep the hash
    * engine-portable (no RNG); for production, rotate with a fixed seed
    * matrix — the bucketing/join shape is identical. */
  def srpBucket(v: Column, bits: Int): Column = srpBucketAt(v, 1, bits)

  /** SRP bucket over axis directions [start, start+bits) — the building
    * block of multi-table (OR-amplified) LSH: table t hashes dims
    * [t·bits+1, (t+1)·bits], vectors colliding in ANY table become
    * candidates. Wider buckets cut the per-bucket pair count (2^bits
    * buckets/table); more tables restore recall. */
  def srpBucketAt(v: Column, start: Int, bits: Int): Column =
    concat((start until start + bits).map(i =>
      when(element_at(v, i) >= 0.0f, "1").otherwise("0")): _*)

  /** Brute-force cosine top-k against a 1-row query DataFrame (broadcast
    * nested-loop of one row — one scan of the corpus, no shuffle). Scoring
    * uses the native codegen'd CosineSimilarity expression (bit-identical
    * to [[cosine]], one fused loop instead of three interpreted passes). */
  def bruteForceTopK(corpus: DataFrame, query: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    graft.functions.NativeFunctions.register(corpus.sparkSession)
    val q = query.select(col(vecCol).as("_qvec"))
    corpus.crossJoin(broadcast(q))
      .withColumn("cos_sim",
        graft.functions.NativeFunctions.cosineSim(col(vecCol), col("_qvec")))
      .drop("_qvec")
  }
}
