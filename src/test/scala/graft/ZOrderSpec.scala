package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ZOrder

/** Z-order clustering: bit-interleave correctness and the locality
  * property that justifies the layout — consecutive chunks of a z-sorted
  * table span a much smaller (orderkey × partkey) bounding box than the
  * same chunks of a single-key sort, which is exactly what parquet
  * min/max row-group pruning exploits for the second dimension. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zorder2 interleaves bits (reference values)") {
    val d = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (0xFFFFFFFFL, 0L))
      .toDF("a", "b")
    val got = d.select(ZOrder.zorder2(col("a"), col("b"))).as[Long].collect().toSeq
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    assert(got == Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (0xFFFFFFFFL, 0L))
      .map { case (a, b) => ref(a, b) })
  }

  test("z-sort clusters BOTH key dimensions: second-key chunk spans shrink, first stays partial") {
    // The property min/max row-group pruning exploits: a predicate on key
    // X only reads chunks whose X-span covers it, so the expected fraction
    // of chunks read ≈ avg chunk X-span / X range. A single-key sort gives
    // perfect a-spans but FULL-range b-spans (every chunk read for any b
    // predicate); z-order trades some a-locality for b-spans an order of
    // magnitude under full range. (Box AREA is the wrong metric — thin
    // full-width slivers minimize area while pruning nothing on b.)
    val rows = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("a"), col("l_partkey").as("b"))
      .as[(Long, Long)].collect()
    def avgSpans(sorted: Array[(Long, Long)], chunk: Int): (Double, Double) = {
      val gs = sorted.grouped(chunk).filter(_.length == chunk).toSeq
      (gs.map(g => (g.map(_._1).max - g.map(_._1).min).toDouble).sum / gs.length,
        gs.map(g => (g.map(_._2).max - g.map(_._2).min).toDouble).sum / gs.length)
    }
    // the engine's normalization: equal-width 16-bit buckets per column
    val (amin, amax) = (rows.map(_._1).min, rows.map(_._1).max)
    val (bmin, bmax) = (rows.map(_._2).min, rows.map(_._2).max)
    def bucket(v: Long, lo: Long, hi: Long): Long =
      math.floor(((v - lo) * 65536L).toDouble / (hi - lo + 1L).toDouble).toLong
    def z(p: (Long, Long)): Long = {
      val (ba, bb) = (bucket(p._1, amin, amax), bucket(p._2, bmin, bmax))
      var v = 0L
      for (i <- 0 until 32) {
        v |= ((ba >> i) & 1L) << (2 * i); v |= ((bb >> i) & 1L) << (2 * i + 1)
      }
      v
    }
    val (aKey, bKey) = avgSpans(rows.sortBy(identity), 256)
    val (aZ, bZ) = avgSpans(rows.sortBy(p => (z(p), p)), 256)
    val (aRange, bRange) = ((amax - amin).toDouble, (bmax - bmin).toDouble)
    assert(bKey > bRange * 0.9, s"single-key sort should leave b unclustered, bKey=$bKey")
    assert(bZ < bKey / 3, s"z-order must shrink b spans: bZ=$bZ bKey=$bKey")
    assert(aZ < aRange / 2, s"z-order must keep partial a locality: aZ=$aZ range=$aRange")
    assert(aKey < aZ, "single-key sort is still the best for its own key")
  }

  test("3-column compact(zorderBy) enables skipping on the THIRD key") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_z3").toString + "/t"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    VersionedTable.write(li.repartitionByRange(16, col("l_orderkey")), root)
    val v = VersionedTable.compact(spark, root,
      targetFileBytes = 6L * 1024, zorderBy = Seq("l_orderkey", "l_partkey", "l_suppkey"))
    assert(VersionedTable.readMeta(root, v, "_operation")
      .exists(_.contains("zorder=l_orderkey,l_partkey,l_suppkey")))
    // per-file zone maps were collected for all three interleaved keys
    val stats = spark.read.parquet(s"$root/v=$v/_stats")
    assert(Seq("min_l_orderkey", "min_l_partkey", "min_l_suppkey")
      .forall(stats.columns.contains))
    val b = li.agg(min("l_suppkey"), max("l_suppkey")).head
    val (cmin, cmax) = (b.getLong(0), b.getLong(1))
    val lo = cmin + (cmax - cmin) / 2.0
    val hi = lo + (cmax - cmin) / 8.0
    val total = VersionedTable.readLatest(spark, root).inputFiles.length
    val pruned = VersionedTable.readPruned(spark, root, "l_suppkey", lo, hi)
    assert(total >= 8, s"compact should have produced many files, got $total")
    assert(pruned.inputFiles.length < total,
      s"3-key z-order must skip on the third key: ${pruned.inputFiles.length}/$total")
    assert(pruned.count() ==
      li.filter(col("l_suppkey") >= lo && col("l_suppkey") <= hi).count())
  }
}
