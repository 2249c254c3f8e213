package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]`, so custom-expression wiring (graft.expressions.*)
  * goes through this accessor — the one sanctioned extension seam for
  * libraries that add native expressions without a SessionExtensions
  * registration round-trip.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
