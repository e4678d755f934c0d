package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over event streams.
  *
  * The classic "total covered time" problem: given per-key intervals
  * that may overlap, merge them and measure the union — online time
  * from heartbeats, machine busy-time from task spans, ad exposure
  * from impression windows. The sweep is one window pass per key:
  * a row opens a NEW merged segment iff its start lies beyond the
  * running max end of everything earlier (`rowsBetween(unbounded, -1)`),
  * segment ids are the running sum of those open flags, and each
  * merged segment is then `max(end) − min(start)`. Two shuffles total
  * (window + final agg), both on the key — no self-join, no
  * interval×interval blow-up, arithmetic all in integer seconds so
  * results are exact and engine-portable.
  */
object Intervals {

  /** Merge per-key intervals `[startCol, endCol]` (integer seconds)
    * and report the union: `(key, n_intervals, n_segments,
    * covered_s)`. Zero- or inverted (end < start) intervals count as
    * length 0 — segment lengths are clamped at 0 so an isolated
    * inverted interval can never drive `covered_s` negative.
    */
  def coveredTime(df: DataFrame, keyCol: String,
                  startCol: String, endCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    val seg = df
      .withColumn("_open",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("_seg", sum(col("_open"))
        .over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
    seg.groupBy(col(keyCol), col("_seg"))
      .agg(count(lit(1)).as("_n"),
        greatest(max(col(endCol)) - min(col(startCol)), lit(0L)).as("_len"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n_intervals"),
        count(lit(1)).as("n_segments"),
        sum(col("_len")).as("covered_s"))
  }
}
