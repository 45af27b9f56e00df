package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable verifiable HyperLogLog (Flajolet et al. '07) — the
  * approx-distinct every engine ships, rebuilt from cross-engine-
  * deterministic primitives so a DuckDB oracle can replay the ESTIMATE
  * bit-for-bit (engine-native sketches cannot be compared across
  * engines; this one can, which is what makes it an oracle-checkable
  * registry citizen rather than a trust-me aggregate).
  *
  * Geometry: m = 256 registers addressed by the first md5 byte; the
  * register value is the leading-zero rank of the next 52 digest bits,
  * computed as 53 − length(bin(v)) — identical minimal-binary
  * semantics in Spark and DuckDB. The harmonic mean is carried as the
  * EXACT long S = Σ 2^(53−Mⱼ) (each term ∈ [1, 2^52], at most 256
  * terms, so S < 2^61 — no float accumulation order to diverge on);
  * the final estimate α·m²/(V₀ + S/2^53) is a fixed sequence of
  * single correctly-rounded IEEE doubles.
  *
  * Scale shape: the only corpus-sized operation is ONE hash-aggregate
  * to ≤ m rows per group — map-side partial max IS the sketch merge
  * (registers combine by max, the distributive aggregate), so the
  * reduce side never sees more than groups·m rows regardless of input
  * size. This is exactly the plan GROUP BY approx_count_distinct
  * compiles to, with the sketch internals laid open.
  */
object Hll {

  /** Register index of a key: first md5 byte (m = 256). */
  def bucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("long")

  /** Register rank of a key: leading-zero rank of the next 52 digest
    * bits via bin() length; 53 when those bits are all zero. */
  def rho(key: Column): Column = {
    val v = conv(substring(md5(key.cast("string")), 3, 13), 16, 10).cast("long")
    when(v === 0, lit(53L)).otherwise(lit(53L) - length(bin(v)))
  }

  /** Raw HLL estimate α·m²/(V₀ + Σ2^(−Mⱼ)) from the occupied-register
    * count and the exact-long scaled harmonic sum S = Σ 2^(53−Mⱼ). */
  def rawEstimate(nRegs: Column, s: Column): Column =
    (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))) * lit(65536.0) /
      ((lit(256L) - nRegs).cast("double") +
        s.cast("double") / lit(9007199254740992.0))

  /** Collapsed register state per group: one corpus pass to
    * (groups..., n_regs, s) — n_regs occupied registers and the exact
    * harmonic sum, i.e. everything [[rawEstimate]] needs. `groups`
    * names existing columns of `df`; with none, the result is the
    * single global sketch row. The two-level aggregate is the
    * mergeable form: the inner (group, bucket) max is the register
    * merge, the outer rollup is sketch finalization — partials of the
    * inner level combine map-side, so the reduce side never sees more
    * than groups·m rows at any input size. */
  def registerState(df: DataFrame, key: Column, groups: String*): DataFrame = {
    val g = groups.map(col)
    df.select(g :+ bucket(key).as("__bucket") :+ rho(key).as("__rho"): _*)
      .groupBy(g :+ col("__bucket"): _*)
      .agg(max(col("__rho")).as("__mj"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - __mj AS INT))")).as("s"))
  }

  /** Per-group verifiable approx-distinct: (groups..., n_regs, est). */
  def approxCountDistinct(df: DataFrame, key: Column, groups: String*): DataFrame =
    registerState(df, key, groups: _*)
      .withColumn("est", rawEstimate(col("n_regs"), col("s")))
}
