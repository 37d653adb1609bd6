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

  /** Unload every state-store provider registered in this JVM's
    * `StateStore` singleton (a `private[sql]` API). Stopped streaming
    * queries leave their providers loaded — each pinning a checkpoint
    * file manager and its threads — so graft's one-shot drained queries
    * call this after `StreamingQuery.stop()`; see
    * `EventStream.drainMemorySink` for the measured leak and the
    * concurrent-query caveat. */
  def unloadAllStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
