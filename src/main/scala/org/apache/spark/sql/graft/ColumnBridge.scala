package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge. Spark 4 backs `Column` by a
  * `ColumnNode`, and the converters live in `private[sql]`
  * `classic.ExpressionUtils`; this object re-exports them to the graft
  * packages (the standard in-namespace extension point for libraries
  * registering custom expressions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
