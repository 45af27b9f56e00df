package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key: interleaves the bits of two key
  * columns so rows close in BOTH dimensions land close in the sort order.
  * Writing a table sorted by this key is the multi-dimensional layout
  * optimization (Delta's `OPTIMIZE ZORDER BY`): parquet min/max row-group
  * stats then prune scans filtered on EITHER key, not just the primary
  * sort key — at 100 TB the difference between reading one key's worth of
  * row groups and a full scan for the second predicate.
  *
  * Pure codegen'd bit arithmetic (the standard magic-number bit spread),
  * identical in DuckDB — the oracle interleaves with the same constants,
  * so the key itself is hash-verified cross-engine. Inputs must fit in 32
  * bits (enforced by the mask; keys beyond 2³² wrap, callers bucket
  * first). ZOrderSpec asserts the locality property: consecutive z-sorted
  * chunks have tighter per-chunk key bounding boxes than single-key order.
  */
object ZOrder {

  /** The 5-step 32→64-bit spread masks (x | x<<16 … pattern). */
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 32 bits of `c` into the even bit positions. */
  def spreadBits32(c: Column): Column =
    SpreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (x, (shift, mask)) => (x.bitwiseOR(shiftleft(x, shift))).bitwiseAND(lit(mask))
    }

  /** 64-bit Morton code of two ≤32-bit keys (a in even bits, b in odd). */
  def zorder2(a: Column, b: Column): Column =
    spreadBits32(a).bitwiseOR(shiftleft(spreadBits32(b), 1))

  /** The same spread as SQL text (for DuckDB oracles), from the same
    * constants — single source of truth for both engines. */
  def spreadSql(expr: String): String =
    SpreadSteps.foldLeft(s"($expr & 4294967295)") {
      case (x, (shift, mask)) => s"(($x | ($x << $shift)) & $mask)"
    }

  def zorder2Sql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** N-column Morton code (Delta `ZORDER BY (c1, …, ck)` for arbitrary
    * k): bit i of column j lands at position i·k + j. Generic
    * bit-by-bit build — k·bits shift/mask terms, all codegen'd integer
    * ops (the 2-column case keeps the 5-step magic-mask [[zorder2]]).
    * Inputs must already be `bits`-wide bucket values
    * ([[rangeBucket]]); k·bits ≤ 63. */
  def zorderN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2 && k * bits <= 63,
      s"zorderN needs ≥2 columns with k*bits ≤ 63, got k=$k bits=$bits")
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** [[zorderN]] as SQL text from the same bit placement — single
    * source of truth for the DuckDB oracle. */
  def zorderNSql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map(i =>
        s"((((${c}) >> $i) & 1) << ${i * k + j})").mkString("(", " | ", ")")
    }.mkString("(", " | ", ")")
  }

  /** Range-normalized bucket in [0, 2^bits): interleaving RAW keys of
    * unequal ranges destroys locality (the wide key's high bits dominate
    * every other bit position — measured WORSE than a single-key sort on
    * the test data), so each column is first mapped onto an equal-width
    * bucket scale, as production z-ordering does. Exact cross-engine:
    * (c−min)·2^bits is an exact long, its double cast is exact (< 2^53),
    * and one IEEE division + floor agree bit-for-bit in both engines. */
  def rangeBucket(c: Column, cmin: Column, cmax: Column, bits: Int): Column =
    floor(((c - cmin) * lit(1L << bits)).cast("double") /
      (cmax - cmin + lit(1L)).cast("double")).cast("long")

  def rangeBucketSql(c: String, cmin: String, cmax: String, bits: Int): String =
    s"CAST(floor(CAST(($c - $cmin) * ${1L << bits} AS DOUBLE) / " +
      s"CAST(($cmax - $cmin + 1) AS DOUBLE)) AS BIGINT)"
}
