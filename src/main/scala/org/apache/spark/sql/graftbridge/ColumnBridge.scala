package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression interop for custom Catalyst expressions.
  *
  * Spark 4 moved `Column` to a backend-agnostic ColumnNode wrapper;
  * the classic converter (`ExpressionUtils`) is `private[sql]`, so
  * this one-file shim lives under the org.apache.spark.sql namespace
  * to re-export the two conversions graft's typed function API needs.
  * No Spark internals are modified or shadowed.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
