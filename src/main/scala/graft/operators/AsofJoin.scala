package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series enrichment join Spark lacks natively:
  * for each left row, attach the single latest right row with
  * `rightTime <= leftTime` and the same key (left-outer: unmatched
  * left rows keep a null payload).
  *
  * Scale shape: the naive rewrites are a range nested-loop (quadratic
  * per key) or a max-subquery double join (two shuffles + re-join).
  * This is the linear one: tag and UNION both sides, ONE shuffle on
  * the key, one per-key window ordered by (time, tag) that carries the
  * latest right payload forward with `last(ignoreNulls)`. Cost is
  * O(n_left + n_right) rows through one exchange + one sort — no
  * interval explosion, skew bounded by the hottest key (salt upstream
  * if a key dominates).
  *
  * Right rows must be unique per (key, time) — pre-aggregate
  * otherwise; at equal times the right row sorts first (tag 0 < 1), so
  * the match is inclusive.
  */
object AsofJoin {

  /** @param rightPayload right-side columns to attach (already named
    *                     as they should appear, minus the prefix)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTimeCol: String, rightTimeCol: String,
               rightPayload: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    val payload = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val leftRow = struct(left.columns.toIndexedSeq.map(col): _*)
    val leftRowType = left.select(leftRow).schema.head.dataType

    val l2 = left.select(
      col(keyCol).as("_k"), col(leftTimeCol).as("_t"), lit(1).as("_tag"),
      lit(null).cast(payloadType).as("_p"), leftRow.as("_l"))
    // a null-time right row would sort before every timestamp and act
    // as a spurious "since forever" payload — drop it; null-time LEFT
    // rows also sort first, so they naturally get a null payload
    val r2 = right.filter(col(rightTimeCol).isNotNull).select(
      col(keyCol).as("_k"), col(rightTimeCol).as("_t"), lit(0).as("_tag"),
      payload.as("_p"), lit(null).cast(leftRowType).as("_l"))

    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l2.unionByName(r2)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    val outLeft = left.columns.map(c => col(s"_l.$c").as(c))
    val outRight = rightPayload.map(c => col(s"_asof.$c").as(s"$prefix$c"))
    joined.select((outLeft ++ outRight).toIndexedSeq: _*)
  }
}
