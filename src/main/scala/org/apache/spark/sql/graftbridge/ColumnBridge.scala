package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the
  * classic-mode bridge (`ExpressionUtils`) is `private[sql]`. This
  * shim lives inside the `org.apache.spark.sql` package namespace to
  * re-export exactly the two conversions a library of custom Catalyst
  * expressions needs. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
