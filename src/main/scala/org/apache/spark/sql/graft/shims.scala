package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 made Column construction private[sql]
  * (Column wraps a ColumnNode, not an Expression), so extension libraries
  * need a shim inside the org.apache.spark.sql namespace — the same
  * technique connector libraries use. No Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
