package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity over two float-array
  * columns, fused into ONE codegen'd loop (dot product and both norms in a
  * single pass over the vectors).
  *
  * Why a custom Expression (builder-prompt preference order (b)): the
  * built-in composition `aggregate(zip_with(a,b,*), 0d, +) / (sqrt(..) *
  * sqrt(..))` is semantically right but each higher-order function is
  * CodegenFallback — per-element interpreted eval with boxed lambdas, and
  * THREE passes over the arrays (dot, norm-a, norm-b). At 100 TB of
  * embeddings the scoring loop is the hot path of every ANN scan; this
  * expression runs inside whole-stage codegen as a tight primitive loop.
  *
  * Numeric parity: elements are widened float→double and accumulated
  * left-to-right, the same op order as the HOF composition and DuckDB's
  * `list_dot_product` — results are bit-identical (asserted in LlmSpec),
  * so DuckDB oracles are unaffected by the swap.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Each side may be float or double (trained k-means centroids are exact
  // double sums; raw embeddings are float). float→double widening is
  // exact, so mixed-width inputs keep DuckDB bit-parity.
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float|double> arguments, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val ga = if (isFloat(left)) "getFloat" else "getDouble"
      val gb = if (isFloat(right)) "getFloat" else "getDouble"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$ga($i);
         |  double $yi = (double) $b.$gb($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the engine's native functions (SQL + Column). */
object NativeFunctions {

  // the parameter arg must be checked foldable BEFORE eval(): calling
  // eval() on a non-literal (e.g. a column reference) throws an opaque
  // unbound-attribute error instead of this usage message
  private def intLiteral(e: Expression, usage: String): Long = {
    if (!e.foldable) throw new IllegalArgumentException(usage)
    e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case _ => throw new IllegalArgumentException(usage)
    }
  }

  /** Name → expression builder for every native function; the single
    * source both registration paths consume ([[register]] for an
    * existing session, [[graft.GraftExtensions]] for
    * `spark.sql.extensions`-configured sessions). */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "hamming" -> (exprs => HammingDistance(exprs(0), exprs(1))),
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "jaccard_counts" -> (exprs => JaccardCounts(exprs(0), exprs(1))),
    "simhash_bits" -> (exprs => SimHashBits(exprs(0), intLiteral(exprs(1),
      "simhash_bits(arr, bits): bits must be an integer literal").toInt)),
    "minhash_base" -> (exprs => MinhashBaseHashes(exprs(0), intLiteral(exprs(1),
      "minhash_base(arr, p): p must be an integer literal"))),
    "rolling_hash" -> (exprs => RollingHashWindows(exprs(0), intLiteral(exprs(1),
      "rolling_hash(arr, w): w must be an integer literal").toInt)))

  def register(spark: SparkSession): Unit =
    for ((name, builder) <- builders)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")

  /** Column-API entry points (require register(spark) in the session). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def hamming(a: Column, b: Column): Column = call_function("hamming", a, b)
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)
  def jaccardCounts(a: Column, b: Column): Column = call_function("jaccard_counts", a, b)
}
