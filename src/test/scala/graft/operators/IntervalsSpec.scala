package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def covered(iv: Seq[(Long, Long, Long)]) =
    Intervals.coveredTime(iv.toDF("k", "st", "en"), "k", "st", "en")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("disjoint intervals sum; overlapping merge; touching chain merges") {
    val out = covered(Seq(
      (1L, 0L, 10L), (1L, 20L, 30L),            // disjoint: 20s, 2 segs
      (2L, 0L, 10L), (2L, 5L, 15L),             // overlap: 15s, 1 seg
      (3L, 0L, 10L), (3L, 10L, 20L), (3L, 20L, 25L))) // touching: 25s
    assert(out(1L) === ((2L, 2L, 20L)))
    assert(out(2L) === ((2L, 1L, 15L)))
    assert(out(3L) === ((3L, 1L, 25L)))
  }

  test("contained and duplicate intervals do not extend coverage") {
    val out = covered(Seq(
      (1L, 0L, 100L), (1L, 10L, 20L), (1L, 0L, 100L), (1L, 99L, 100L)))
    assert(out(1L) === ((4L, 1L, 100L)))
  }

  test("a later short interval inside an earlier long one (running max, not lag)") {
    // (0,100) then (1,2) then (3,200): naive lag(en) would see 2 < 3
    // and open a new segment; the running MAX keeps 100
    val out = covered(Seq((1L, 0L, 100L), (1L, 1L, 2L), (1L, 3L, 200L)))
    assert(out(1L) === ((3L, 1L, 200L)))
  }

  test("inverted (end < start) intervals clamp to zero, never negative") {
    // an isolated inverted interval forms its own segment whose raw
    // max(en)-min(st) is negative; the clamp keeps covered_s ≥ 0
    val out = covered(Seq((1L, 10L, 4L),                 // inverted alone
      (2L, 0L, 5L), (2L, 30L, 20L), (2L, 50L, 60L)))    // mixed
    assert(out(1L) === ((1L, 1L, 0L)))
    assert(out(2L) === ((3L, 3L, 15L)))                  // 5 + 0 + 10
  }

  test("result is partitioning-invariant") {
    val iv = (0L until 500L).map(i => (i % 7, i * 3 % 97, i * 3 % 97 + 5))
    val a = Intervals.coveredTime(iv.toDF("k", "st", "en").repartition(1),
      "k", "st", "en").orderBy("k").collect().toSeq
    val b = Intervals.coveredTime(iv.toDF("k", "st", "en").repartition(11),
      "k", "st", "en").orderBy("k").collect().toSeq
    assert(a === b)
  }
}
