package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column node-based and scoped the Expression<->Column
  * converters `private[sql]`; extensions shipping native Catalyst
  * expressions need this two-line bridge inside the sql package
  * namespace (standard extension-developer pattern).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
