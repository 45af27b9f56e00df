package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index: the production layout for the composed ANN
  * path. The PQ code table (4 codes/vector — 16× smaller than float32)
  * is written PARTITIONED BY the coarse-quantizer cent_id, so a probe
  * statically prunes to its nprobe partitions of the *compressed* table:
  * scan cost ≈ corpus · nprobe/centroids ÷ 16 versus a raw brute-force
  * scan, before the ADC lookup table (broadcast, m·k entries) scores a
  * single row per (vector, subspace) batch-locally.
  *
  * Same contract as [[IvfIndex]]: build scans the corpus once; probe
  * collects only the nprobe centroid ids to the driver (query routing
  * over broadcast-small metadata) so the partition filter is a literal
  * `isin` the planner prunes statically.
  */
object IvfPqIndex {

  /** Coarse-assign every vector (broadcast centroids, top-1 window),
    * join its PQ codes, and write partitioned by cent_id.
    * Layout: (vec_id, m, code) under cent_id=... directories. */
  def build(embeddings: DataFrame, cents: DataFrame, books: DataFrame,
            m: Int, subDim: Int, path: String): Unit = {
    val spark = embeddings.sparkSession
    graft.functions.NativeFunctions.register(spark)
    val cos = graft.functions.NativeFunctions.cosineSim _
    val assign = embeddings.crossJoin(broadcast(cents))
      .withColumn("cos_c", cos(col("embedding"), col("cvec")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id"))
    PqOps.encode(embeddings, books, m, subDim)
      .join(assign, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(path)
  }

  /** Rank centroids against the query, scan ONLY the nprobe best
    * partitions of the persisted code table, ADC-score them. Returns
    * (vec_id, cent_id, approx_dot) unranked — callers order/limit. */
  def probe(spark: SparkSession, path: String, cents: DataFrame,
            books: DataFrame, query: DataFrame, nprobe: Int,
            m: Int, subDim: Int): DataFrame = {
    graft.functions.NativeFunctions.register(spark)
    val cos = graft.functions.NativeFunctions.cosineSim _
    val q = query.select(col("embedding").as("qvec"))
    val probeIds = cents.crossJoin(broadcast(q))
      .select(col("cent_id"), cos(col("cvec"), col("qvec")).as("cos_c"))
      .orderBy(col("cos_c").desc, col("cent_id"))
      .limit(nprobe)
      .collect().map(_.getLong(0))
    val codes = graft.sources.VersionedTable.readParquetDir(spark, path)
      .filter(col("cent_id").isin(probeIds: _*))
      .select(col("vec_id"), col("m"), col("code"),
        col("cent_id").cast("long").as("cent_id"))
    PqOps.adcScores(codes.select("vec_id", "m", "code"), books, query, m, subDim)
      .join(codes.select("vec_id", "cent_id").distinct(), Seq("vec_id"))
      .select(col("vec_id"), col("cent_id"), col("approx_dot"))
  }
}
