package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.PipelineConfig
import graft.layers.Medallion

/** Config-file loading: the YAML-subset parser over the repo's own
  * configs/pipeline_config.yml, and the Medallion.Config it produces. */
class PipelineConfigSpec extends AnyFunSuite {

  test("parses the repo pipeline_config.yml: scalars, lists, comments, quotes") {
    val c = PipelineConfig.load("configs/pipeline_config.yml")
    assert(c.str("paths.bronze") == "/tmp/graft_lakehouse/bronze")
    assert(c.double("quality_thresholds.null_rate_required", -1) == 0.0)
    assert(c.double("quality_thresholds.null_rate_default", -1) == 0.001)
    assert(c.double("quality_thresholds.null_rate_days_since_prior", -1) == 0.07)
    assert(c.int("spark.shuffle_partitions", -1) == 32)
    assert(c.list("tables.gold") == Seq("fct_orders", "dim_users", "dim_products",
      "mart_dept_performance", "mart_reorder_velocity"))
    assert(c.list("tables.bronze").contains("order_products"))
    // LSH geometry knobs for the corpus-scale dedup operators
    assert(c.int("dedup.simhash_band_bits", -1) == 16)
    assert(c.int("dedup.simhash_bands", -1) == 4)
    assert(c.int("dedup.srp_table_bits", -1) == 16)
    assert(c.int("dedup.srp_tables", -1) == 4)
    // chunk / pack / segment-dedup knobs
    assert(c.int("chunk.size_tokens", -1) == 40)
    assert(c.int("chunk.stride_tokens", -1) == 30)
    assert(c.int("pack.seq_tokens", -1) == 512)
    assert(c.int("pack.bucket_docs", -1) == 100)
    assert(c.int("segdedup.segment_tokens", -1) == 10)
    // ANN geometry knobs
    assert(c.int("ann.ivf_centroids", -1) == 16)
    assert(c.int("ann.ivf_nprobe", -1) == 2)
    assert(c.int("ann.lloyd_rounds", -1) == 2)
    assert(c.int("ann.pq_subspaces", -1) == 4)
    assert(c.int("ann.pq_codebook", -1) == 16)
  }

  test("Medallion.configFromYaml maps paths and thresholds onto Config") {
    val cfg = Medallion.configFromYaml("configs/pipeline_config.yml")
    assert(cfg.rawDir == "/tmp/graft_lakehouse/raw")
    assert(cfg.goldDir == "/tmp/graft_lakehouse/gold")
    assert(cfg.nullRateRequired == 0.0)
    assert(cfg.nullRateDaysSincePrior == 0.07)
    assert(cfg.reconDrift == 0.001)
    assert(cfg.velocityMinPurchases == 50L)
  }

  test("missing keys fall back to reference defaults; quoted values unquote") {
    val c = PipelineConfig.parse(Seq(
      "paths:",
      "  data: \"/a/b\"  # trailing comment",
      "  bronze: /raw#no-space-hash-kept-out",
      "nested:",
      "  deep:",
      "    k: 7"))
    assert(c.str("paths.data") == "/a/b")
    assert(c.str("paths.bronze") == "/raw#no-space-hash-kept-out")
    assert(c.str("nested.deep.k") == "7")
    assert(c.double("quality_thresholds.null_rate_default", 0.001) == 0.001)
  }

  test("tab-indented lines are rejected (YAML rule), not silently flattened") {
    val ex = intercept[RuntimeException] {
      PipelineConfig.parse(Seq("paths:", "\tdata: /a/b"))
    }
    assert(ex.getMessage.contains("tab in indentation"))
  }
}
