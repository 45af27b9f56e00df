package graft.typed

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset surface (SURVEY.md §1: `Dataset[T]` where compile-time
  * field checks help) with a custom `Aggregator[IN,BUF,OUT]` — the typed
  * custom-aggregation path of the build brief's preference order (b).
  * Encoders keep rows in Tungsten binary format; the Aggregator's
  * reduce/merge run as a regular partial/final hash aggregate. */
object TypedOps {

  /** lineitem row (testdata schema, FIXTURES.md §B). */
  case class LineItem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: java.sql.Timestamp)

  def lineitems(spark: SparkSession, sfDir: String): Dataset[LineItem] = {
    import spark.implicits._
    graft.sources.VersionedTable.readParquetDir(spark,
      s"$sfDir/lineitem.parquet").as[LineItem]
  }

  /** Narrow projection of lineitem — only the 4 columns the aggregation
    * consumes. groupByKey deserializes every input row into its case class
    * BEFORE aggregating, so feeding the full 11-column LineItem pays ~3×
    * the deserialization (and defeats parquet column pruning: `.as[T]`
    * alone does not prune). Select-then-as keeps the scan at 4 columns and
    * the per-row decode minimal. */
  case class LineSlim(l_returnflag: String, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double)

  def lineitemsSlim(spark: SparkSession, sfDir: String): Dataset[LineSlim] = {
    import spark.implicits._
    graft.sources.VersionedTable.readParquetDir(spark,
        s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .as[LineSlim]
  }

  /** Net revenue Σ price·(1−discount): zero/reduce/merge/finish with
    * map-side partial aggregation for free. */
  object RevenueAgg extends Aggregator[LineSlim, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(b: Double, a: LineSlim): Double =
      b + a.l_extendedprice * (1.0 - a.l_discount)
    override def merge(b1: Double, b2: Double): Double = b1 + b2
    override def finish(r: Double): Double = r
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** (count, sum, max) in one typed buffer — a multi-stat Aggregator. */
  object QtyStatsAgg extends Aggregator[LineSlim, (Long, Double, Double), (Long, Double, Double)] {
    override def zero: (Long, Double, Double) = (0L, 0.0, Double.MinValue)
    override def reduce(b: (Long, Double, Double), a: LineSlim): (Long, Double, Double) =
      (b._1 + 1, b._2 + a.l_quantity, math.max(b._3, a.l_quantity))
    override def merge(x: (Long, Double, Double), y: (Long, Double, Double)): (Long, Double, Double) =
      (x._1 + y._1, x._2 + y._2, math.max(x._3, y._3))
    override def finish(r: (Long, Double, Double)): (Long, Double, Double) = r
    override def bufferEncoder: Encoder[(Long, Double, Double)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[(Long, Double, Double)] = bufferEncoder
  }

  /** Typed groupByKey + custom Aggregators → revenue and qty stats per
    * return flag. */
  def revenueByFlag(ds: Dataset[LineSlim]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.l_returnflag)
      .agg(RevenueAgg.toColumn.name("revenue_raw"),
        QtyStatsAgg.toColumn.name("qty_stats"))
      .map { case (flag, rev, (n, sumQty, maxQty)) => (flag, rev, n, sumQty, maxQty) }
      .toDF("l_returnflag", "revenue_raw", "n_rows", "sum_qty", "max_qty")
  }
}
