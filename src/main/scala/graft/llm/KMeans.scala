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
  *  - init = the first k vectors by id (at corpus scale swap in a
  *    kmeans||-style sampled init; the iteration code is unchanged),
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
  def train(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    graft.functions.NativeFunctions.register(spark)
    val cos = graft.functions.NativeFunctions.cosineSim _
    var cents = embeddings.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      .localCheckpoint()
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
        .localCheckpoint() // k rows; truncates the per-round lineage
    }
    cents
  }
}
