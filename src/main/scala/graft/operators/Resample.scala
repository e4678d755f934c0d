package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling: bucket events to a fixed step and fill the
  * gaps, so downstream models see a dense regular grid instead of a
  * sparse one (the classic feature-engineering step before any
  * forecasting / anomaly job).
  *
  * Scale shape: the bucketed aggregate is one partial-aggregated
  * shuffle keyed by (key, bucket). The dense grid is generated
  * DISTRIBUTED — per key, `sequence(min, max, step)` explodes on the
  * executors from a 2-column span table (one row per key, never a
  * driver-side loop or a cross join against a global calendar), then a
  * left join pulls the observed buckets in. Grid size is bounded by
  * span/step per key, independent of the event count.
  */
object Resample {

  /** Per-(key, bucket) counts and sums on a dense time grid: every
    * `step` from the key's first bucket to its last, zero-filled where
    * no event landed. `valueCol` sums as exact decimal(18,2) so the
    * result is partitioning- and engine-independent.
    *
    * @param step a calendar interval literal, e.g. "INTERVAL 1 HOUR"
    * @param trunc the date_trunc unit matching `step`, e.g. "hour"
    */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valueCol: String, trunc: String = "hour",
              step: String = "INTERVAL 1 HOUR"): DataFrame = {
    val bucketed = events
      .groupBy(col(keyCol), date_trunc(trunc, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_sv"))
    val grid = bucketed
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("_b0"), max(col("bucket")).as("_b1"))
      .select(col(keyCol),
        explode(expr(s"sequence(_b0, _b1, $step)")).as("bucket"))
    grid.join(bucketed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("_sv"), lit(0).cast("decimal(18,2)"))
          .cast("double"), 2).as("sum_value"))
  }

  /** Last-observation-carried-forward: fill NULLs in `valueCol` with
    * the most recent non-null value of the same key, by event time —
    * the standard sensor/price-series repair before feature extraction.
    * One keyed window with `last(ignoreNulls)` over an unbounded-
    * preceding frame; `tieBreak` orders simultaneous rows so the fill
    * is deterministic. Rows before a key's first observation stay
    * null (no backward fill).
    */
  def locf(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
           tieBreak: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy((tsCol +: tieBreak).map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn(s"${valueCol}_filled",
      last(col(valueCol), ignoreNulls = true).over(w))
  }
}
