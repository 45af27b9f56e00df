package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.PqOps

/** Product quantization: code-table invariants and the shortlist+rerank
  * recall property (PQ's production role is candidate generation — the
  * compressed scan shortlists, exact scoring re-ranks the shortlist). */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.01"

  test("every vector encodes to one code per subspace, codes within 0..k-1") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val books = PqOps.trainCodebooks(e, 4, 16, 16, 2)
    val codes = PqOps.encode(e, books, 4, 16)
    val n = e.count()
    assert(codes.count() == n * 4)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= 4).isEmpty)
    val mm = codes.agg(min("code"), max("code")).head
    assert(mm.getLong(0) >= 0L && mm.getLong(1) <= 15L)
    // codebooks: 4 subspaces, ≤16 centroids each, 16-dim codewords
    assert(books.select("m").distinct().count() == 4)
    assert(books.filter(size(col("cvec")) =!= 16).isEmpty)
  }

  test("PQ shortlist of 50 holds most of the exact top-10 (rerank pattern)") {
    graft.functions.NativeFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0L)
    val qv = q.select(col("embedding").as("qvec"))
    val exact = e.filter(col("vec_id") =!= 0L).crossJoin(broadcast(qv))
      .select(col("vec_id"),
        graft.functions.NativeFunctions.dotProduct(col("embedding"), col("qvec")).as("d"))
      .orderBy(col("d").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val books = PqOps.trainCodebooks(e, 4, 16, 16, 2)
    val codes = PqOps.encode(e, books, 4, 16)
    val shortlist = PqOps.adcScores(codes, books, q, 4, 16)
      .filter(col("vec_id") =!= 0L)
      .orderBy(col("approx_dot").desc, col("vec_id")).limit(50)
      .collect().map(_.getLong(0)).toSet
    val hit = (shortlist & exact).size
    // uniform random 64-dim corpus (worst case for PQ — no cluster
    // structure): measured 7/10 inside a 10% shortlist; floor 5 leaves
    // noise margin while still proving the shortlist concentrates mass.
    assert(hit >= 5, s"exact-top10 ∩ PQ-top50 = $hit/10")
  }
}
