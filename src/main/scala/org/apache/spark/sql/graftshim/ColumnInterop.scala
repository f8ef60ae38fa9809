package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column <-> Expression converters.
  * Spark 4 made `Column` backend-agnostic (ColumnNode-based); classic
  * Catalyst interop lives behind `org.apache.spark.sql.classic`.
  * Extension libraries conventionally shim it from inside the sql
  * package namespace — this is the only file that does so.
  */
object ColumnInterop {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
