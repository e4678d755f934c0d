package graft.operators

import graft.SparkSpec
import graft.functions.Det
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("cleanRatings casts, bounds, and null-drops") {
    val raw = Seq(
      (Some(1L), Some(10L), Some("7")),   // keep
      (Some(2L), Some(11L), Some("0")),   // out of range (lo exclusive)
      (Some(3L), Some(12L), Some("11")),  // out of range (hi inclusive)
      (Some(4L), Some(13L), Some("10")),  // keep (boundary)
      (None,     Some(14L), Some("5")),   // null user
      (Some(5L), Some(15L), Some("x")))   // bad cast → null → dropped
      .toDF("u", "i", "r")
    val out = Cleaning.cleanRatings(raw, "u", "i", "r")
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 10L, 7), (4L, 13L, 10)))
  }

  test("binarize thresholds strictly") {
    val df = Seq(99.9, 100.0, 100.1).toDF("v")
      .select(Cleaning.binarize(col("v"), 100.0).as("b"))
    assert(df.as[Double].collect().toSeq == Seq(0.0, 0.0, 1.0))
  }

  test("popularity top-N applies floor and deterministic ordering") {
    val r = Seq((1, 10, 9), (2, 10, 9), (1, 11, 9), (2, 11, 9), (3, 12, 10))
      .toDF("u", "itemId", "rating")
    // items 10, 11 tie on (avg 9.0, count 2) → itemId ascending breaks it;
    // item 12 has count 1 < floor 2 → excluded
    val top = Popularity.topByAvgRating(r, "itemId", "rating", minCount = 2, topN = 10)
      .select("itemId").as[Int].collect().toSeq
    assert(top == Seq(10, 11))
  }

  test("summaryStats matches hand-computed moments") {
    val df = Seq(1, 2, 3, 4).toDF("x")
    val row = Popularity.summaryStats(df, col("x")).collect()(0)
    assert(row.getAs[Long]("n") == 4)
    assert(row.getAs[Double]("mean") == 2.5)
    assert(row.getAs[Double]("stddev") == math.rint(math.sqrt(5.0 / 3) * 1e4) / 1e4)
    assert(row.getAs[Int]("min") == 1 && row.getAs[Int]("max") == 4)
  }

  test("Det.sumProductRounded is the exact decimal revenue sum") {
    // 10.01·0.95 + 20.02·0.90 = 9.5095 + 18.0180 = 27.5275 → 27.53
    val df = Seq((10.01, 0.05), (20.02, 0.10)).toDF("p", "d")
    val v = df.agg(Det.sumProductRounded(col("p"), col("d"))).as[Double].head()
    assert(v == 27.53)
  }
}
