package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the minhash dedup pipeline. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    import graft.llm.TextOps._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warmup")(spark.range(1000000L).selectExpr("sum(id)").collect())
    val reparted = docs.repartition(8)
    val hsDf = reparted
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) >= 1)
      .select(col("doc_id"), shingleHashes(col("sh")).as("hs"))
    time("hs plain count")(hsDf.count())
    time("hs force compute")(hsDf.selectExpr("sum(hs[0])").collect())
    time("hs force compute 2")(hsDf.selectExpr("sum(hs[0])").collect())
    val ck = time("hs localCheckpoint")(hsDf.localCheckpoint())
    time("ck count")(ck.count())
    val sigs = (0 until 8).map(k => minhashSig(col("hs"), k).as(s"sig$k"))
    val sig = ck.select(col("doc_id") +: sigs: _*)
      .withColumn("band0", bandKey((0 to 3).map(k => col(s"sig$k"))))
      .withColumn("band1", bandKey((4 to 7).map(k => col(s"sig$k"))))
    time("sig collect")(sig.collect())
    time("sig collect 2")(sig.collect())
    spark.stop()
  }
}
