package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ev(key: String, t: String, v: Double) =
    (key, java.sql.Timestamp.valueOf(t), v)

  test("gapFill zero-fills missing buckets between each key's first and last hour") {
    val rows = Seq(
      ev("a", "2024-01-01 00:10:00", 1.0),
      ev("a", "2024-01-01 00:50:00", 2.0),
      // 01:00 and 02:00 empty for a
      ev("a", "2024-01-01 03:05:00", 4.0),
      ev("b", "2024-01-01 05:00:00", 7.0))
      .toDF("k", "ts", "value")
    val out = Resample.gapFill(rows, "k", "ts", "value")
      .select(col("k"), col("bucket").cast("string"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(
      ("a", "2024-01-01 00:00:00", 2L, 3.0),
      ("a", "2024-01-01 01:00:00", 0L, 0.0),
      ("a", "2024-01-01 02:00:00", 0L, 0.0),
      ("a", "2024-01-01 03:00:00", 1L, 4.0),
      ("b", "2024-01-01 05:00:00", 1L, 7.0)))
  }

  test("locf carries the last non-null forward per key, leaves leading nulls") {
    val rows = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), None, 1L),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), Some(5.0), 2L),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), None, 3L),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), Some(7.0), 4L),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:04:00"), None, 5L),
      ("b", java.sql.Timestamp.valueOf("2024-01-01 00:02:30"), None, 6L))
      .toDF("k", "ts", "v", "id")
    val out = Resample.locf(rows, "k", "ts", "v", tieBreak = Seq("id"))
      .select(col("id"), col("v_filled"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> None, 2L -> Some(5.0), 3L -> Some(5.0),
      4L -> Some(7.0), 5L -> Some(7.0), 6L -> None))
  }

  test("gapFill on an empty frame returns an empty frame (no sequence blow-up)") {
    val empty = Seq.empty[(String, java.sql.Timestamp, Double)]
      .toDF("k", "ts", "value")
    assert(Resample.gapFill(empty, "k", "ts", "value").isEmpty)
  }

  test("gapFill grid is per-key (no global calendar cross join) and single-bucket keys work") {
    val rows = Seq(ev("solo", "2024-06-01 12:30:00", 5.0)).toDF("k", "ts", "value")
    val out = Resample.gapFill(rows, "k", "ts", "value").collect()
    assert(out.length == 1 && out.head.getLong(2) == 1L)
    // plan: the grid side must come from a generator (explode of
    // sequence), not a cartesian/broadcast-nested-loop against a
    // calendar table
    val plan = Resample.gapFill(rows, "k", "ts", "value")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }
}
