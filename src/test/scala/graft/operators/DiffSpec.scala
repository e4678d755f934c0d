package graft.operators

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/same with null-safe compares") {
    val old = Seq(
      (1L, Some(10.0)), // unchanged
      (2L, Some(20.0)), // value change
      (3L, Some(30.0)), // removed
      (4L, None),       // null -> value = changed
      (5L, Some(50.0))  // value -> null = changed
    ).toDF("k", "v")
    val next = Seq(
      (1L, Some(10.0)),
      (2L, Some(21.0)),
      (4L, Some(40.0)),
      (5L, None),
      (6L, Some(60.0))  // added
    ).toDF("k", "v")
    val out = Diff.snapshotDiff(old, next, Seq("k"), Seq("v"))
      .select("k", "change").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "same", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "changed", 6L -> "added"))
  }

  test("snapshotDiff carries old and new values for audit") {
    val old = Seq((2L, 20.0)).toDF("k", "v")
    val next = Seq((2L, 21.0)).toDF("k", "v")
    val r = Diff.snapshotDiff(old, next, Seq("k"), Seq("v"))
      .select("v_old", "v_new").as[(Double, Double)].head()
    assert(r == ((20.0, 21.0)))
  }
}
