package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** The 0-based rank of this row among the rows of its PARTITION whose
  * `child` is NULL (NULL for rows where `child` is set) — the columnar
  * kernel of identity-column assignment: `hw + step * (partitionOffset
  * + nullRank + 1)` fills exactly the missing values with a contiguous
  * id run, entirely inside whole-stage codegen (the previous
  * implementation dropped to `rdd.zipWithIndex`, paying full
  * InternalRow→Row deserialization per identity-bearing batch).
  *
  * The counter advances on the CHILD'S nullness, not on evaluation
  * count, so the expression is correct whether an enclosing
  * `coalesce`/`CASE` evaluates it lazily (codegen branches) or eagerly
  * (interpreted fallback). Stateful/nondeterministic: the optimizer
  * will not duplicate, reorder, or push it through exchanges; per-task
  * initialization resets the counter, and retried tasks recompute their
  * whole partition, so speculative execution cannot tear a sequence. */
case class NullRankInPartition(child: Expression)
    extends UnaryExpression with Nondeterministic {

  @transient private[this] var count: Long = _

  // carries a per-partition counter: never cache/share instances
  override def stateful: Boolean = true

  override protected def initializeInternal(partitionIndex: Int): Unit =
    count = 0L

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override protected def evalInternal(input: InternalRow): Any =
    if (child.eval(input) == null) { val v = count; count += 1L; v }
    else null

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val countTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "nullRank")
    ctx.addPartitionInitializationStatement(s"$countTerm = 0L;")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (${c.isNull}) {
          ${ev.isNull} = false;
          ${ev.value} = $countTerm;
          $countTerm++;
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): NullRankInPartition =
    copy(child = newChild)
}
