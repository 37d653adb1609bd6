package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column<->Expression converters (Spark 4 moved
  * Column onto ColumnNode; classic conversions live behind package-private
  * helpers). This is the one sanctioned-by-necessity reach into Spark
  * internals — everything else in graft uses the public API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
