package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style event attribution.
  *
  * Last-touch: each conversion event is credited to the most recent
  * qualifying touch event by the same user within a lookback window.
  * One window pass per user (`last(..., ignoreNulls)` over the
  * time-ordered stream) — no self-join, no per-conversion scan of the
  * user's history, so the cost is one shuffle on the user key however
  * long the histories get. The ordering key includes the event id so
  * ties at identical timestamps resolve identically on every engine.
  */
object Attribution {

  /** Credit each `conversionType` event to the latest prior
    * `touchTypes` event of the same user within `lookbackS` seconds.
    * Emits one row per conversion: `(user_id, conv_ts, value,
    * attr_type, attr_age_s)` with `attr_type` NULL when no touch
    * qualifies. Timestamps are exact integer seconds.
    */
  def lastTouch(events: DataFrame, touchTypes: Seq[String],
                conversionType: String, lookbackS: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = col("event_type").isin(touchTypes: _*)
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        // cast("timestamp") first: tolerates TIMESTAMP_NTZ input (NTZ
        // has no direct long cast; under UTC session tz it's identical)
        col("value"), col("ts").cast("timestamp").cast("long").as("ts_s"))
      .withColumn("attr_ts", last(when(touch, col("ts_s")), ignoreNulls = true).over(w))
      .withColumn("attr_type_raw",
        last(when(touch, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === conversionType)
      .select(col("user_id"), col("ts_s").as("conv_ts"), col("value"),
        when(col("attr_ts") >= col("ts_s") - lookbackS, col("attr_type_raw"))
          .as("attr_type"),
        when(col("attr_ts") >= col("ts_s") - lookbackS,
          col("ts_s") - col("attr_ts")).as("attr_age_s"))
  }
}
