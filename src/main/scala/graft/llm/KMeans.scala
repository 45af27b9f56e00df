package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spherical k-means trainer for the IVF coarse quantizer (Lloyd
  * iterations as DataFrame aggregations; reference has no ANN — extension
  * scope per SURVEY §2).
  *
  * Designed to be DETERMINISTIC ACROSS ENGINES so the DuckDB oracle can
  * replay training exactly:
  *  - init = the first k vectors by id for the oracle path; at corpus
  *    scale [[trainParallel]] swaps in the deterministic kmeans|| init
  *    (the iteration code is shared),
  *  - a FIXED number of Lloyd rounds (no data-dependent stopping),
  *  - assignment = argmax cosine, ties to the lowest cent_id,
  *  - centroid update = per-dimension DECIMAL(38,18) SUM of members.
  *    Decimal sums are exact and order-insensitive — a double sum would
  *    depend on partition order and could flip a near-tied assignment —
  *    and cosine is scale-invariant, so the member SUM points exactly
  *    where the mean does (spherical k-means needs no division).
  *
  * Each round is one broadcast-join corpus scan (assignment) plus one
  * aggregation shuffled by (cent_id, dim) — k·dims rows, trivially small
  * next to the scan at any corpus size.
  */
object KMeans {

  /** Train k centroids over (vec_id, embedding) rows; returns
    * (cent_id, cvec). Clusters that lose all members drop out (both
    * engines drop them identically, so the oracle agrees). */
  def train(embeddings: DataFrame, k: Int, iters: Int): DataFrame =
    lloyd(embeddings,
      embeddings.filter(col("vec_id") < k)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec")),
      iters)

  /** Corpus-scale variant: kmeans|| init (Bahmani et al., VLDB'12)
    * followed by the same Lloyd rounds. The oracle queries keep the
    * first-k init (DuckDB replays it); this path is spec-verified —
    * its determinism story is hash coins, not a replayable SQL text. */
  def trainParallel(embeddings: DataFrame, k: Int, iters: Int,
                    l: Int, rounds: Int): DataFrame =
    lloyd(embeddings, parallelInit(embeddings, k, l, rounds), iters)

  /** kmeans||-style oversampling init, made DETERMINISTIC: each point's
    * Bernoulli coin is md5(vec_id:round) — identical across runs,
    * partitionings and engines, unlike rand(). Per round, point x joins
    * the candidate set with p = min(1, l·cost(x)/φ) where cost(x) =
    * 1 − max cosine to the current candidates and φ = Σ cost — so ~l
    * candidates land per round, biased toward uncovered regions. After
    * r rounds the ≤ 1+l·r candidates are weighted by attraction counts
    * and reduced to k driver-side with weighted greedy k-center
    * (farthest-first): the candidate set is broadcast-small metadata at
    * ANY corpus size (l·r ≈ O(k log n) rows), which is exactly where
    * Spark MLlib also goes driver-side. Each round costs one corpus
    * scan against broadcast candidates plus one scalar aggregate (φ). */
  def parallelInit(embeddings: DataFrame, k: Int, l: Int, rounds: Int): DataFrame = {
    val spark = embeddings.sparkSession
    graft.functions.NativeFunctions.register(spark)
    val cos = graft.functions.NativeFunctions.cosineSim _
    def coin(round: Int) = // uniform [0,1) from the first 8 md5 hex chars
      conv(substring(md5(concat_ws(":", col("vec_id"), lit(round))), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0)
    val first = embeddings.orderBy(col("vec_id")).limit(1)
    var cand = first.select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
      .localCheckpoint(false) // lazy: the next round's broadcast materializes
    for (r <- 1 to rounds) {
      val cost = embeddings.crossJoin(broadcast(cand))
        .groupBy(col("vec_id"))
        .agg((lit(1.0) - max(cos(col("embedding"), col("cvec")))).as("cost"))
      val phi = cost.agg(sum(col("cost"))).head.getDouble(0)
      if (phi > 0.0) {
        val sampled = cost
          .filter(coin(r) < least(lit(1.0), lit(l.toDouble) * col("cost") / lit(phi)))
          .join(embeddings, Seq("vec_id"))
          .select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
        cand = cand.unionByName(sampled).localCheckpoint(false)
      }
    }
    // attraction weights: one more corpus scan, then everything is tiny
    val weights = embeddings.crossJoin(broadcast(cand))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(cos(col("embedding"), col("cvec")).desc, col("cand_id"))))
      .filter(col("rn") === 1)
      .groupBy(col("cand_id")).agg(count(lit(1)).as("w"))
    val rows = cand.join(weights, Seq("cand_id"))
      .select(col("cand_id"), col("cvec"), col("w"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getLong(2)))
      .sortBy(_._1)
    require(rows.length >= k,
      s"kmeans|| produced ${rows.length} candidates < k=$k; raise l or rounds")
    // weighted greedy k-center over the candidates (deterministic: ties
    // break to the lowest cand_id; distance = 1 − cosine)
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
    }
    val chosen = scala.collection.mutable.ArrayBuffer(
      rows.maxBy(c => (c._3, -c._1)))
    while (chosen.length < k) {
      val next = rows.filterNot(c => chosen.exists(_._1 == c._1))
        .maxBy { c =>
          val dMin = chosen.map(s => 1.0 - cosine(c._2, s._2)).min
          (c._3 * dMin, -c._1)
        }
      chosen += next
    }
    // weighted Lloyd polish over the candidates (still driver-side, still
    // deterministic — fixed candidate order, ties to the lowest index):
    // greedy k-center alone seeds hull points; the polish moves seeds to
    // weighted member means so downstream list populations balance. Same
    // post-step Spark MLlib applies after its kmeans|| reduction.
    val dim = rows.head._2.length
    var centers = chosen.map(_._2.clone()).toArray
    for (_ <- 1 to 5) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val seen = new Array[Boolean](k)
      rows.foreach { c =>
        val j = centers.indices.maxBy(i => (cosine(c._2, centers(i)), -i))
        var d = 0; while (d < dim) { sums(j)(d) += c._3 * c._2(d); d += 1 }
        seen(j) = true
      }
      // cosine is scale-invariant: the weighted SUM points where the
      // weighted mean does, no division needed
      centers = centers.indices.map(i => if (seen(i)) sums(i) else centers(i)).toArray
    }
    import spark.implicits._
    centers.toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, c.map(_.toFloat)) }
      .toDF("cent_id", "cvec")
  }

  /** Fixed-round Lloyd refinement of the given (cent_id, cvec) init. */
  private def lloyd(embeddings: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    graft.functions.NativeFunctions.register(spark)
    val cos = graft.functions.NativeFunctions.cosineSim _
    var cents = init.localCheckpoint(false)
    for (_ <- 1 to iters) {
      val assigned = embeddings.crossJoin(broadcast(cents))
        .withColumn("cos_c", cos(col("embedding"), col("cvec")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))))
        .filter(col("rn") === 1)
        .select(col("cent_id"), col("embedding"))
      cents = assigned
        .select(col("cent_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cent_id"), col("dim"))
        .agg(sum(col("v").cast("decimal(38,18)")).as("sv"))
        .groupBy(col("cent_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("sv").cast("double").as("sval")))),
          x => x("sval")).as("cvec"))
        // k rows; truncates the per-round lineage. LAZY: the sole
        // consumer (next round's broadcast / the caller's one action)
        // materializes it — no dedicated checkpoint job per round
        .localCheckpoint(false)
    }
    cents
  }
}
