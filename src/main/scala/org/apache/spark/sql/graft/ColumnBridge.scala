package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column wrap a ColumnNode instead of an Expression; the
  * supported bridge (classic.ExpressionUtils) is private[sql], so this
  * one-file accessor — placed in the sql package namespace like other
  * extension libraries do — exposes exactly the two conversions the
  * graft SQL-function builders need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly convert the Column's node tree to a catalyst expression
    * (UnresolvedFunction etc.) so the ANALYZER can resolve it —
    * ExpressionUtils.expression returns a lazy ColumnNodeExpression
    * wrapper that analysis treats as opaque.
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
