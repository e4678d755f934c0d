package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression converters.
  *
  * Spark 4 moved the public `Column` onto `ColumnNode` (sql-api) and
  * made the classic converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Custom native
  * expressions ([[graft.functions.ArrayDotProduct]]) still need a
  * Column wrapper to participate in the DataFrame API without a
  * per-session function-registry round-trip, so this one-file package
  * bridge re-exports the two converters. No other private API is
  * touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
