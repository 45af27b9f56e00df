package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native rolling Rabin–Karp window hashes: every sliding `w`-token
  * window of a string array, keyed by a 64-bit polynomial hash, in ONE
  * O(n_tokens + total_chars) pass.
  *
  * The sliding-window exact-substring dedup (LlmQueries.dupSpanDropList,
  * after Lee et al. 2022 "Deduplicating Training Data Makes Language
  * Models Better") must key ALL n−w+1 windows of the corpus. Building
  * each window string and md5-ing it is O(n·w) bytes hashed — at w=10
  * the corpus is digested ten times over, and that stage dominates the
  * whole pipeline. This kernel hashes each token once (FNV-1a over its
  * UTF-8 bytes) and then rolls the window polynomial
  * h(i) = Σ_j tok(i+j)·B^(w−1−j) (mod 2^64) in O(1) per step:
  * h(i+1) = (h(i) − tok(i)·B^(w−1))·B + tok(i+w). Token boundaries are
  * inherent — hashes combine per-token, so ["ab","c"] ≠ ["a","bc"]
  * regardless of the separator ambiguity a string-concat key must guard.
  *
  * Equal windows ALWAYS collide (no false negatives), so the hash is a
  * complete candidate filter; unequal windows can collide (64-bit
  * birthday + the known structured-collision weakness of mod-2^64
  * polynomial hashes), so callers must verify candidates on an exact key
  * before acting — dupSpanDropList re-derives md5 window keys for the
  * candidate subset only, keeping the cryptographic no-false-drop
  * guarantee while the O(n·w) digest cost shrinks to the duplicated
  * fraction. Null tokens hash to a fixed sentinel (tokenizers here never
  * emit null; a null element must not poison the whole document).
  *
  * Returns array<long> of length max(n−w+1, 0) — primitive, no boxing,
  * fused into whole-stage codegen via [[RollingHashKernel]].
  */
case class RollingHashWindows(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"window width must be positive, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHashKernel.windowHashes(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashKernel.windowHashes($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): RollingHashWindows =
    copy(child = newChild)
}

object RollingHashKernel {
  /** Odd multiplier (golden-ratio constant): full period mod 2^64. */
  private final val B = 0x9e3779b97f4a7c15L
  /** Sentinel token hash for null elements. */
  private final val NullTok = 0x517cc1b727220a95L
  private final val Empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  def windowHashes(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return Empty
    // pass 1: each token hashed once (FNV-1a 64 over UTF-8 bytes)
    val tok = new Array[Long](n)
    var i = 0
    while (i < n) {
      tok(i) = if (arr.isNullAt(i)) NullTok else fnv1a(arr.getUTF8String(i).getBytes)
      i += 1
    }
    // B^(w-1) mod 2^64 (natural long overflow IS the modulus)
    var bw1 = 1L
    var k = 1
    while (k < w) { bw1 *= B; k += 1 }
    // pass 2: first window direct, the rest roll in O(1)
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * B + tok(i); i += 1 }
    out(0) = h
    i = 0
    while (i + w < n) {
      h = (h - tok(i) * bw1) * B + tok(i + w)
      out(i + 1) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
