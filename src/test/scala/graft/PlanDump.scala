package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Diagnostic main: dump the physical plans PLANS.md cites for the
  * column-mapping read path (run with `sbt "Test/runMain graft.PlanDump"`). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft_plandump").toString + "/t"
    val o = (1 to 400).map(i => (i.toLong, s"s${i % 3}", i.toLong * 10))
      .toDF("k", "status", "cents")
    VersionedTable.write(o.repartitionByRange(8, col("k")), root,
      statsCols = Seq("k"))
    VersionedTable.setTblProperties(root, Map("gvt.columnMapping" -> "name"))
    VersionedTable.renameColumn(spark, root, "cents", "amount")

    println("=== mapped readLatest (logical view = one Project over the scan) ===")
    VersionedTable.readLatest(spark, root).explain("formatted")

    println("=== mapped readPruned on the RENAMED key (logical name) ===")
    val pruned = VersionedTable.readPruned(spark, root, "k", 1.0, 50.0)
    pruned.explain("formatted")
    println(s"inputFiles after zone-map pruning: ${pruned.inputFiles.length} of 8")

    println("=== SQL over the mapped gvt view (V1 resolving relation) ===")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW pd_t USING gvt OPTIONS (path '$root')")
    val q = spark.sql("SELECT status, sum(amount) AS s FROM pd_t WHERE k <= 50 GROUP BY status")
    q.explain("formatted")
    q.collect()

    // r11: the metadata-only aggregate fold (MetaAggRewrite)
    val root2 = Files.createTempDirectory("graft_plandump_meta").toString + "/t"
    VersionedTable.write((1 to 300).map(i => (i.toLong, s"p${i % 3}"))
      .toDF("id", "p"), root2, partitionBy = Seq("p"), statsCols = Seq("id"))
    GraftSession.withExtensions(spark) { sess =>
      println("=== metadata fold: global count/min/max over gvt ===")
      sess.read.format("gvt").load(root2)
        .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
        .explain("formatted")
      println("=== metadata fold: GROUP BY partition column ===")
      sess.read.format("gvt").load(root2)
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
        .explain("formatted")
      println("=== NO fold (soundness): filter present -> real scan ===")
      sess.read.format("gvt").load(root2).filter(col("id") > 100)
        .agg(count(lit(1)).as("n")).explain("formatted")
    }
  }
}
