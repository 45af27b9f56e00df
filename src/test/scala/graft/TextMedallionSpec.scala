package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.layers.TextMedallion
import graft.queries.LlmQueries
import graft.quality.DataQualityError
import graft.sources.VersionedTable

/** End-to-end text-corpus medallion: the layers must agree with the
  * individually-verified operators they compose (q_text_pipeline election,
  * q_pack mass conservation), and the drop-rate gate must halt a
  * mis-configured run BEFORE any silver write. */
class TextMedallionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val raw = "/root/testdata/sf0.001"

  test("bronze→silver→gold composes the verified operators; gate halts bad runs") {
    val base = java.nio.file.Files.createTempDirectory("graft_textmed").toString
    val cfg = TextMedallion.Config(rawDir = raw, bronzeDir = s"$base/bronze",
      silverDir = s"$base/silver", goldDir = s"$base/gold")
    val stats = TextMedallion.runAll(spark, cfg)

    val nRaw = spark.read.parquet(s"$raw/documents.parquet").count()
    assert(stats("bronze_documents") == nRaw)

    // silver == the verified q_text_pipeline election
    val election = LlmQueries.queries("q_text_pipeline")(spark, raw)
    assert(stats("silver_documents") == election.filter(col("in_silver")).count())

    // every silver doc survived BOTH stages: no dups, no filtered reasons
    val silver = VersionedTable.readLatest(spark, s"${cfg.silverDir}/documents")
    assert(silver.filter(col("status") =!= "silver").count() == 0)

    // gold packing conserves the silver token mass exactly
    val totTokens = silver.agg(sum("n_tokens")).collect()(0).getLong(0)
    val packed = VersionedTable.readLatest(spark, s"${cfg.goldDir}/training_sequences")
    assert(packed.agg(sum("seq_tokens")).collect()(0).getLong(0) == totTokens)
    assert(stats("training_sequences") == packed.count())

    // the quality mart partitions the silver corpus exactly once
    val mart = VersionedTable.readLatest(spark, s"${cfg.goldDir}/mart_corpus_quality")
    assert(mart.agg(sum("n_docs")).collect()(0).getLong(0) == stats("silver_documents"))

    // gate-halt: this corpus drops ~63% (synthetic word-soup fails
    // lang-ID); a 0.5 bar must throw before writing silver
    val halting = cfg.copy(maxDropRate = 0.5, silverDir = s"$base/silver_halt")
    intercept[DataQualityError] { TextMedallion.runSilver(spark, halting) }
    assert(!new java.io.File(s"$base/silver_halt/documents").exists,
      "gate must halt BEFORE the silver write")
  }
}
