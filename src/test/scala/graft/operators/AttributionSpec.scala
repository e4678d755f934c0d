package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  // (user, event_id, type, value, ts-seconds) → timestamp column
  private def ev(rows: Seq[(Long, Long, String, Double, Long)]) =
    rows.toDF("user_id", "event_id", "event_type", "value", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")

  test("credits the LATEST prior touch within the lookback") {
    val out = Attribution.lastTouch(ev(Seq(
        (1L, 1L, "click", 0.0, 100L),
        (1L, 2L, "view", 0.0, 200L),
        (1L, 3L, "purchase", 9.5, 250L))),
      Seq("click", "view"), "purchase", lookbackS = 3600L).collect()
    assert(out.length === 1)
    assert(out.head.getString(3) === "view")   // latest, not first
    assert(out.head.getLong(4) === 50L)
  }

  test("stale touches beyond the lookback and later touches do not attribute") {
    val out = Attribution.lastTouch(ev(Seq(
        (1L, 1L, "click", 0.0, 100L),
        (1L, 2L, "purchase", 5.0, 5000L),   // click is 4900s old > 3600
        (2L, 3L, "purchase", 5.0, 100L),
        (2L, 4L, "click", 0.0, 200L))),     // touch AFTER conversion
      Seq("click", "view"), "purchase", lookbackS = 3600L)
      .collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(out === Map(1L -> true, 2L -> true))
  }

  test("attribution does not leak across users; ties order by event_id") {
    val out = Attribution.lastTouch(ev(Seq(
        (1L, 1L, "click", 0.0, 100L),
        (2L, 2L, "purchase", 5.0, 150L),        // other user's click ≠ mine
        (3L, 10L, "click", 0.0, 100L),
        (3L, 11L, "view", 0.0, 100L),           // same ts: higher id wins
        (3L, 12L, "purchase", 5.0, 100L))),     // conversion at same ts too
      Seq("click", "view"), "purchase", lookbackS = 3600L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    assert(out(2L) === null)
    assert(out(3L) === "view") // rows strictly before by (ts, id): id 10,11
  }
}
