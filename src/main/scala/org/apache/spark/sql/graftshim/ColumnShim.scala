package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 routes `Column` through ColumnNodes; the classic converter
  * (`ExpressionUtils`) is `private[sql]`, so this one-file shim lives in the
  * `org.apache.spark.sql` namespace to expose the two conversions the graft
  * custom expressions need.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
