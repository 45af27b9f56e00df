package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization: the memory-scaling ANN path (Jégou et al., "PQ
  * for nearest neighbor search", TPAMI'11). The 64-dim vector splits into
  * M=4 16-dim subspaces; each subspace gets its own k=16 codebook trained
  * by L2 Lloyd rounds; a vector compresses to 4 one-byte codes, and query
  * scoring is ADC — per-subspace lookup tables of query·centroid parts,
  * summed per code tuple. At 100 TB the code table is what a scoring scan
  * reads (16× smaller than raw float32), and the 4×16-entry lookup table
  * broadcasts with the query.
  *
  * All arithmetic is FIXED-POINT: elements quantize to
  * floor(x·2²⁰ + 0.5) once up front, and every later value — member
  * sums, mean centroids floor(s/n + 0.5), assignment scores
  * 2·(x·c) − c·c, ADC parts — is an integer below 2⁵³, held exactly in
  * doubles, so sums are order-insensitive and the DuckDB oracle replays
  * training/encoding/scoring bit-for-bit (float→decimal casts do NOT
  * round-trip across engines; integer arithmetic does). The final
  * approx_dot rescales by 2⁻⁴⁰ — a power of two, exact. Quantization
  * noise is ~2⁻²¹ per element, far below ANN ranking sensitivity.
  *
  * All four codebooks train TOGETHER: sub-vectors carry their subspace id
  * `m`, so one broadcast join + one window + one aggregation per Lloyd
  * round trains 4×16 centroids — the round count, not the subspace count,
  * sets the number of corpus scans.
  */
object PqOps {
  private def dot = graft.functions.NativeFunctions.dotProduct _
  private val Scale = 1048576.0 // 2^20

  /** (vec_id, m, sub): per-subspace sub-vectors, elements quantized to
    * integral doubles on the 2⁻²⁰ grid. */
  def subVectors(embeddings: DataFrame, m: Int, subDim: Int): DataFrame = {
    val fixed = transform(col("embedding"),
      x => floor(x.cast("double") * Scale + 0.5).cast("double"))
    embeddings.select(col("vec_id"), fixed.as("fx"))
      .select(col("vec_id"), posexplode(array(
        (0 until m).map(i => slice(col("fx"), i * subDim + 1, subDim)): _*))
        .as(Seq("m", "sub")))
  }

  /** Train per-subspace codebooks; returns (m, cent_id, cvec) with cvec
    * on the same fixed-point grid as the inputs. */
  def trainCodebooks(embeddings: DataFrame, m: Int, subDim: Int,
                     k: Int, iters: Int): DataFrame = {
    graft.functions.NativeFunctions.register(embeddings.sparkSession)
    val subs = subVectors(embeddings, m, subDim).localCheckpoint()
    var cents = subs.filter(col("vec_id") < k)
      .select(col("m"), col("vec_id").as("cent_id"), col("sub").as("cvec"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = assign(subs, cents)
      cents = assigned
        .select(col("m"), col("cent_id"), posexplode(col("sub")).as(Seq("dim", "v")))
        .groupBy(col("m"), col("cent_id"), col("dim"))
        // integer-valued doubles: the sum is exact at any order, and the
        // re-gridded mean floor(s/n + 0.5) is one IEEE division of exact
        // integers — identical in any engine
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .withColumn("mv", floor(col("sv") / col("n") + 0.5).cast("double"))
        .groupBy(col("m"), col("cent_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("mv").as("mval")))),
          x => x("mval")).as("cvec"))
        .localCheckpoint() // m·k rows
    }
    cents
  }

  /** Nearest codeword per (vector, subspace): argmin ‖sub−c‖² = argmax
    * 2·(sub·c) − c·c (exact integers), ties to the lowest cent_id. */
  private def assign(subs: DataFrame, cents: DataFrame): DataFrame =
    subs.join(broadcast(cents), Seq("m"))
      .withColumn("score", lit(2.0) * dot(col("sub"), col("cvec")) -
        dot(col("cvec"), col("cvec")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"), col("m"))
          .orderBy(col("score").desc, col("cent_id"))))
      .filter(col("rn") === 1)

  /** Code table: (vec_id, m, code) — the compressed corpus. */
  def encode(embeddings: DataFrame, codebooks: DataFrame,
             m: Int, subDim: Int): DataFrame =
    assign(subVectors(embeddings, m, subDim), codebooks)
      .select(col("vec_id"), col("m"), col("cent_id").as("code"))

  /** ADC scores of the whole code table against one query row: the
    * query's per-subspace dot with every codeword forms the (m·k)-entry
    * lookup table; each vector's approximate dot is its parts added in
    * fixed subspace order, rescaled by 2⁻⁴⁰ (exact).
    * Returns (vec_id, code0..code{M-1}, approx_dot). */
  def adcScores(codes: DataFrame, codebooks: DataFrame, query: DataFrame,
                m: Int, subDim: Int): DataFrame = {
    val qsubs = subVectors(query, m, subDim)
      .select(col("m"), col("sub").as("qsub"))
    val lut = codebooks.join(qsubs, Seq("m"))
      .select(col("m"), col("cent_id").as("code"),
        dot(col("qsub"), col("cvec")).as("part"))
    val parts = codes.join(broadcast(lut), Seq("m", "code"))
    val codeCols = (0 until m).map(i =>
      max(when(col("m") === i, col("code"))).as(s"code$i"))
    val partCols = (0 until m).map(i =>
      max(when(col("m") === i, col("part"))).as(s"part$i"))
    parts.groupBy(col("vec_id"))
      .agg((codeCols ++ partCols).head, (codeCols ++ partCols).tail: _*)
      .select(col("vec_id") +: (0 until m).map(i => col(s"code$i")) :+
        ((0 until m).map(i => col(s"part$i")).reduce(_ + _) / (Scale * Scale))
          .as("approx_dot"): _*)
  }
}
