package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("type2 chains versions into [from, to) intervals with one current row per key") {
    val changes = Seq(
      (1L, "v1", t("2024-01-01 00:00:00")),
      (1L, "v2", t("2024-02-01 00:00:00")),
      (1L, "v3", t("2024-03-01 00:00:00")),
      (2L, "solo", t("2024-06-01 00:00:00")))
      .toDF("bk", "payload", "eff")
    val out = Scd.type2(changes, Seq("bk"), "eff")
      .select($"bk", $"payload", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSet
    assert(out == Set(
      (1L, "v1", t("2024-01-01 00:00:00"), Some(t("2024-02-01 00:00:00")), false),
      (1L, "v2", t("2024-02-01 00:00:00"), Some(t("2024-03-01 00:00:00")), false),
      (1L, "v3", t("2024-03-01 00:00:00"), None, true),
      (2L, "solo", t("2024-06-01 00:00:00"), None, true)))
  }

  test("type2 tie-break makes simultaneous versions deterministic") {
    val changes = Seq(
      (1L, 10L, t("2024-01-01 00:00:00")),
      (1L, 11L, t("2024-01-01 00:00:00")), // same effective time
      (1L, 12L, t("2024-02-01 00:00:00")))
      .toDF("bk", "batch", "eff")
    val out = Scd.type2(changes, Seq("bk"), "eff", tieBreak = Seq("batch"))
      .select($"batch", $"is_current").as[(Long, Boolean)].collect().toSet
    assert(out == Set((10L, false), (11L, false), (12L, true)))
  }
}
