package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Evaluation barrier for EXPENSIVE computed columns that feed filters
  * (guide §4.4, applied to built-in expression trees): when a filter
  * references a projected column, predicate pushdown substitutes the
  * column's defining expression into the filter and pushes it toward
  * the scan — so the expensive expression is evaluated TWICE (once in
  * the pushed filter, once in the surviving projection), and the
  * pushed copy lands BELOW any repartition, i.e. on the narrow scan
  * partitioning the repartition exists to escape. Measured on
  * t_bloom_decontaminate: a 1.8 s single-task filter stage recomputing
  * the whole gram+bloom chain under the exchange, plus the same chain
  * again above it.
  *
  * Once(child) is a semantic no-op (same value, same nulls, same
  * generated code) marked NONDETERMINISTIC, which the optimizer may
  * not duplicate, reorder past, or substitute through — the standard
  * Spark idiom for "evaluate exactly once, here" (the asNondeterministic
  * escape hatch Python UDFs use, available to native expression trees).
  * Wrap only genuinely expensive columns: the same flag also blocks
  * legitimate reorderings of *other* predicates across this projection.
  */
case class Once(child: Expression) extends UnaryExpression
    with Nondeterministic {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_once"

  override protected def initializeInternal(partitionIndex: Int): Unit = ()

  override protected def evalInternal(input: InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object OnceOps {
  /** Column API: pin `c` to a single evaluation site. */
  def once(c: Column): Column =
    ColumnBridge.column(Once(ColumnBridge.expression(c)))
}
