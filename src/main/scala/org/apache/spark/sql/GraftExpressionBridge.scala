package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to [[classic.ExpressionUtils]] (private[sql]): lets the
  * engine wrap its native Catalyst expressions (e.g.
  * graft.functions.PointWkb) into public Columns from library code —
  * the standard technique Spark extension libraries use for Column ↔
  * Expression conversion on Spark 4. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
