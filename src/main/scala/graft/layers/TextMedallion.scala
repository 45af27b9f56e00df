package graft.layers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.LlmQueries
import graft.quality.{DataQualityError, Gates}
import graft.sources.VersionedTable

/** The reference's medallion lakehouse pattern applied to the TEXT
  * corpus — bronze→silver→gold for LLM training data, composed from the
  * individually-verified operators instead of re-deriving them:
  *
  *   bronze  raw document ingestion + audit column (Medallion.runBronze
  *           semantics on `documents`)
  *   silver  the cleaned corpus: exact-dup winners ∩ quality keeps
  *           ([[LlmQueries.docDecisions]], the verified q_text_pipeline
  *           election), gated on the drop rate — a collapsing corpus
  *           halts the pipeline the way a null-rate breach halts the
  *           Instacart flow
  *   gold    training artifacts, versioned like the Instacart marts:
  *           packed training sequences ([[LlmQueries.packSequencesOf]],
  *           the verified q_pack shape over SILVER) and the per-
  *           (lang, status) corpus-quality mart
  *
  * Scale shape is inherited from the parts: dup election shuffles md5
  * keys only, packing runs the distributed prefix sum, the quality mart
  * is one hash aggregation. The silver frame is computed once and reused
  * by both gold builds (cached, mirroring Medallion's cached-silver S9).
  */
object TextMedallion {

  final case class Config(
      rawDir: String,
      bronzeDir: String,
      silverDir: String,
      goldDir: String,
      maxDropRate: Double = 0.8,
      seqTokens: Long = 512L,
      bucketDocs: Long = 100L)

  private val log = graft.util.Log("text_medallion")

  def runBronze(spark: SparkSession, cfg: Config): Long = {
    log.info(s"text bronze: ${cfg.rawDir} -> ${cfg.bronzeDir}")
    val docs = graft.sources.VersionedTable.readParquetDir(spark, s"${cfg.rawDir}/documents.parquet")
      .withColumn("_bronze_ingested_at", current_timestamp())
    docs.write.mode("overwrite").parquet(s"${cfg.bronzeDir}/documents")
    val n = graft.sources.VersionedTable.readParquetDir(spark, s"${cfg.bronzeDir}/documents").count()
    Gates.logLayerStats("bronze", "documents", n)
    n
  }

  def runSilver(spark: SparkSession, cfg: Config): Long = {
    log.info(s"text silver: ${cfg.bronzeDir} -> ${cfg.silverDir}")
    val bronze = graft.sources.VersionedTable.readParquetDir(spark, s"${cfg.bronzeDir}/documents")
    // cached: the decided frame feeds BOTH the drop-rate gate and the
    // silver write — without the cache the md5 dup-election groupBy+join
    // would run twice per build (the S9 cached-silver discipline)
    val decided = LlmQueries.docDecisions(bronze.drop("_bronze_ingested_at")).cache()
    try {
      val counts = decided.groupBy(col("in_silver")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val kept = counts.getOrElse(true, 0L)
      val dropped = counts.getOrElse(false, 0L)
      val total = kept + dropped
      val dropRate = if (total == 0) 1.0 else dropped.toDouble / total
      // gate-halt: a pipeline that throws away most of its corpus is
      // mis-configured (bad filter thresholds, wrong language markers) —
      // stop before the write, like the Instacart null-rate gates
      if (total == 0 || dropRate > cfg.maxDropRate)
        throw new DataQualityError(
          f"silver drop rate $dropRate%.3f exceeds ${cfg.maxDropRate}%.3f " +
            s"($dropped of $total docs dropped)")
      val silver = decided.filter(col("in_silver"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_tokens"), col("status"))
        .withColumn("_silver_processed_at", current_timestamp())
      VersionedTable.write(silver, s"${cfg.silverDir}/documents",
        allowEvolution = true)
      Gates.logLayerStats("silver", "documents", kept)
      kept
    } finally decided.unpersist()
  }

  def runGold(spark: SparkSession, cfg: Config): Map[String, Long] = {
    log.info(s"text gold: ${cfg.silverDir} -> ${cfg.goldDir}")
    // silver cached once, consumed by both gold builds (S9 semantics)
    val silver = VersionedTable.readLatest(spark, s"${cfg.silverDir}/documents")
      .drop("_silver_processed_at").cache()

    val packed = LlmQueries.packSequencesOf(silver, cfg.seqTokens, cfg.bucketDocs)
      .withColumn("_gold_computed_at", current_timestamp())
    VersionedTable.write(packed, s"${cfg.goldDir}/training_sequences",
      allowEvolution = true)
    val nPacked = VersionedTable.readLatest(spark, s"${cfg.goldDir}/training_sequences").count()
    Gates.logLayerStats("gold", "training_sequences", nPacked)

    val mart = silver.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .withColumn("_gold_computed_at", current_timestamp())
    VersionedTable.write(mart, s"${cfg.goldDir}/mart_corpus_quality",
      allowEvolution = true)
    val nMart = VersionedTable.readLatest(spark, s"${cfg.goldDir}/mart_corpus_quality").count()
    Gates.logLayerStats("gold", "mart_corpus_quality", nMart)

    silver.unpersist()
    Map("training_sequences" -> nPacked, "mart_corpus_quality" -> nMart)
  }

  def runAll(spark: SparkSession, cfg: Config): Map[String, Long] = {
    val b = runBronze(spark, cfg)
    val s = runSilver(spark, cfg)
    runGold(spark, cfg) ++ Map("bronze_documents" -> b, "silver_documents" -> s)
  }
}
