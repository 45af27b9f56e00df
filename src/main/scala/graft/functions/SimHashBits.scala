package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash over an array of per-token md5 hex digests → bit-string.
  *
  * Why a custom Expression (builder-brief preference order (b)): the HOF
  * formulation (`aggregate` + 64-wide `zip_with` over literal arrays, see
  * TextOps.simhash64FromHashesHof) is semantically right but generates
  * enormous per-bit expression code — large enough that HotSpot never
  * promotes it past C1 on a fresh JVM (measured: ~10s cold vs ~1s here at
  * sf0.1), and each Janino compile adds to the bench-wide code-cache churn.
  * This kernel is one short static loop: it JITs immediately and its
  * generated call site is a single line inside whole-stage codegen. At
  * 100 TB the fingerprint pass maps over every document — it must be loop
  * code, not expression-tree code.
  *
  * Bit semantics (identical to the HOF forms and the DuckDB oracle):
  *  - bits=16: bit j (0-based) = sign of Σ over tokens of ±1, + iff hex
  *    char j of the token's md5 has its high nibble bit set (value ≥ 8).
  *  - bits=64: hex char c contributes two bits — bit 2c from (v & 8),
  *    bit 2c+1 from (v & 4) — one digest serves all 64 positions
  *    (Manku/Jain/Sarma web-dedup configuration).
  * Null/short/non-hex positions contribute −1, matching the `when(...)
  * .otherwise(-1)` of the HOF form.
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits == 16 || bits == 64, s"simhash_bits supports 16 or 64 bits, got $bits")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits expects array<string> of md5 hex digests, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashKernel.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashKernel {
  /** Static so the generated call site is monomorphic and trivially JIT-able. */
  def compute(arr: ArrayData, bits: Int): UTF8String = {
    val twoBitsPerChar = bits == 64
    val nchars = if (twoBitsPerChar) 32 else bits
    val cnt = new Array[Int](bits)
    val m = arr.numElements()
    var k = 0
    while (k < m) {
      if (arr.isNullAt(k)) {
        var j = 0
        while (j < bits) { cnt(j) -= 1; j += 1 }
      } else {
        val bs = arr.getUTF8String(k).getBytes
        var c = 0
        while (c < nchars) {
          val v = if (c < bs.length) Character.digit(bs(c).toChar, 16) else -1
          if (twoBitsPerChar) {
            cnt(2 * c) += (if (v >= 0 && (v & 8) != 0) 1 else -1)
            cnt(2 * c + 1) += (if (v >= 0 && (v & 4) != 0) 1 else -1)
          } else {
            cnt(c) += (if (v >= 0 && (v & 8) != 0) 1 else -1)
          }
          c += 1
        }
      }
      k += 1
    }
    val out = new Array[Byte](bits)
    var j = 0
    while (j < bits) { out(j) = if (cnt(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }
}
