package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native per-shingle MinHash base hash: md5(s) → top 60 bits → mod p,
  * for every element of a string array in one pass.
  *
  * Replaces the built-in chain `transform(sh, s -> conv(substring(md5(s),
  * 1, 15), 16, 10) % p)`, which materializes a 32-char hex string per
  * shingle, re-parses 15 chars of it back into a long, and carries a
  * 4-deep expression tree per element through codegen. This kernel takes
  * the top 60 bits straight from the digest bytes — no hex string, no
  * parse — and emits a primitive long array. The signature stage maps
  * over every shingle of every document at 100 TB; it is the single
  * hottest expression in the dedup pipeline.
  *
  * Value parity with the HOF chain (and the DuckDB oracle's
  * `('0x' || substr(md5(s),1,15))::BIGINT % p`): the first 15 hex chars
  * of an md5 digest ARE its top 60 bits, read big-endian; both are
  * positive, so `%` agrees across engines. Parity asserted in LlmSpec.
  */
case class MinhashBaseHashes(child: Expression, p: Long) extends UnaryExpression {
  require(p > 0, s"modulus must be positive, got $p")

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => ArrayType(LongType)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_base expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.baseHashes(input.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashKernel.baseHashes($c, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): MinhashBaseHashes =
    copy(child = newChild)
}

object MinhashKernel {
  // MessageDigest is stateful; one instance per executor thread
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def baseHashes(arr: ArrayData, p: Long): ArrayData = {
    val n = arr.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
    if (hasNull) {
      // slow path, preserves the HOF chain's null-in → null-out elements
      val out = new Array[Any](n)
      var k = 0
      while (k < n) {
        out(k) = if (arr.isNullAt(k)) null else java.lang.Long.valueOf(hashOne(arr, k, p))
        k += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var k = 0
      while (k < n) { out(k) = hashOne(arr, k, p); k += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  /** md5 digest → big-endian top 60 bits (= first 15 hex chars) → mod p. */
  private def hashOne(arr: ArrayData, i: Int, p: Long): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(arr.getUTF8String(i).getBytes)
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
    v % p
  }
}
