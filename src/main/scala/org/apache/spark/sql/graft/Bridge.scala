package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression converters (+ one Dataset rebind).
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

  /** Rebind a logical plan to `spark` (the classic `Dataset.ofRows`).
    * Used by [[graft.operators.TopKAgg.perGroup]] to attach its output
    * to a derived session whose SQL conf scopes the raised
    * object-hash-aggregate fallback threshold to queries that actually
    * contain a bounded top-k — instead of session-globally.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
