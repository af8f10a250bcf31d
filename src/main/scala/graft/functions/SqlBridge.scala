// ExpressionUtils is private[sql]; this shim (inside the sql package) is the
// one sanctioned hop from a Catalyst Expression to a user-facing Column.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlBridge {
  def column(e: Expression): Column     = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
