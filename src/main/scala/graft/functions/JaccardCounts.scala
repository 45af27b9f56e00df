package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: set-intersection and set-union sizes of
  * two string arrays in one fused pass — `struct<n_common, n_union>`.
  *
  * Why (builder-prompt preference order (b)): the composition
  * `size(array_intersect(a,b))` + `size(array_union(a,b))` builds three
  * hash sets AND materializes two intermediate arrays per row, only to
  * take their lengths. This kernel builds two sets, materializes
  * nothing, and computes |A∪B| = |A| + |B| − |A∩B|. The exact-verify
  * step of an LSH dedup runs this per candidate pair — at 10¹³ pairs the
  * intermediate arrays are pure GC pressure.
  *
  * Semantics match the built-ins for non-null elements (distinct set
  * comparison; null elements are ignored, which the dedup tokenizer
  * never produces).
  */
case class JaccardCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_common", LongType, nullable = false),
    StructField("n_union", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"jaccard_counts expects two array<string> arguments, got ${left.dataType} / ${right.dataType}")
  }

  /** Shared by eval and the generated code (ctx.references): one fused
    * pass, two sets, no intermediate arrays. */
  def counts(a: ArrayData, b: ArrayData): InternalRow = {
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) setA.add(a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String]()
    var common = 0L
    var j = 0
    while (j < b.numElements()) {
      if (!b.isNullAt(j)) {
        val s = b.getUTF8String(j)
        if (setB.add(s) && setA.contains(s)) common += 1L
      }
      j += 1
    }
    val union = setA.size.toLong + setB.size.toLong - common
    new GenericInternalRow(Array[Any](common, union))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    counts(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // the loop body lives in this expression object; generated code
      // calls it through a reference — still inside the whole-stage
      // pipeline (no row-at-a-time fallback), one virtual call per row
      val ref = ctx.addReferenceObj("jaccardCounts", this, classOf[JaccardCounts].getName)
      s"${ev.value} = $ref.counts($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardCounts =
    copy(left = newLeft, right = newRight)
}
