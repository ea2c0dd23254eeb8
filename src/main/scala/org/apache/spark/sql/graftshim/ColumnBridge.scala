package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Session-free Expression ⇄ Column bridge. `ExpressionUtils` is
  * `private[sql]`, so this one-file shim lives inside the sql package
  * namespace — the same pattern libraries like frameless and Sedona use
  * to construct Columns from custom Catalyst expressions WITHOUT a
  * function-registry round trip (which would force every call site to
  * have registered on the owning session first).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
