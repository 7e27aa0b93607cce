package org.apache.spark.sql.graftsql

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column <-> Expression converters so
  * graft's native Catalyst expressions can be used as Columns. Lives in
  * an org.apache.spark.sql subpackage purely for access; contains no
  * Spark code.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
