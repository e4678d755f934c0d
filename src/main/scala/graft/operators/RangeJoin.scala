package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — the other time-series join
  * Spark lacks: inner-join each point (key, t) to every interval
  * (key, [start, end)) that contains it.
  *
  * A raw non-equi range condition plans as a (broadcast) nested loop —
  * quadratic per key and a driver-OOM hazard when neither side is
  * small. This is the binned rewrite: quantize the time axis into
  * fixed-width bins, explode each interval to the bins it overlaps
  * (fan-out ≈ len/binWidth + 1 — pick binWidth near the typical
  * interval length), EQUI-join on (key, bin), then filter exact
  * containment. Each point lives in exactly one bin, so every matching
  * pair is produced exactly once — no post-dedup, one shuffle, and the
  * join parallelizes over (key, bin) instead of funneling per key.
  *
  * Intervals must be non-empty (end > start); column names across the
  * two inputs must not collide (pre-project).
  */
object RangeJoin {

  def pointInInterval(intervals: DataFrame, points: DataFrame,
                      keyCol: String, startCol: String, endCol: String,
                      timeCol: String,
                      binSeconds: Long = 86400L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binMicros = binSeconds * 1000000L
    // cast-to-timestamp first: tolerates TIMESTAMP_NTZ inputs (the
    // testdata has shipped both encodings; unix_micros requires ltz,
    // and under a UTC session tz the cast is value-identical)
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))
    // end is exclusive: the last covered bin holds end − 1µs
    val iv = intervals.withColumn("_bin",
      explode(sequence(
        floor(micros(startCol) / binMicros),
        floor((micros(endCol) - 1) / binMicros))))
    val pt = points.withColumn("_bin",
      floor(micros(timeCol) / binMicros))
    iv.join(pt, Seq(keyCol, "_bin"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("_bin")
  }
}
