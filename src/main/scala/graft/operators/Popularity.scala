package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Det

/** Popularity rankings (SURVEY A1/A2 + P6 + T1/T2).
  *
  * `get_popular_books` in the reference (`ALS_model3.py:182-191`):
  * group by item, avg+count, floor on count, multi-key sort desc,
  * limit. `orderBy(...).limit(n)` plans as `TakeOrderedAndProject`
  * (per-partition top-n + driver merge of n·partitions rows) — this
  * already scales; the groupBy is the only shuffle, with partial
  * (map-side) aggregation for free.
  */
object Popularity {

  /** Top-N items by (avg rating, count) with a minimum-count floor.
    * Output: (itemCol, avg_rating, num_ratings). Adds the item key as
    * the last sort key so the top-N frontier is total-ordered
    * (deterministic under ties — the reference's version is not).
    */
  def topByAvgRating(df: DataFrame, itemCol: String, ratingCol: String,
                     minCount: Long, topN: Int): DataFrame =
    df.groupBy(col(itemCol))
      .agg(
        Det.avgRounded(col(ratingCol)).as("avg_rating"),
        count(col(ratingCol)).as("num_ratings"))
      .filter(col("num_ratings") >= minCount)
      .orderBy(col("avg_rating").desc, col("num_ratings").desc, col(itemCol))
      .limit(topN)

  /** Count-based popularity pool (`recommendations3.py:83-86`). */
  def topByCount(df: DataFrame, itemCol: String, topN: Int): DataFrame =
    df.groupBy(col(itemCol))
      .agg(count(lit(1)).as("num_ratings"))
      .orderBy(col("num_ratings").desc, col(itemCol))
      .limit(topN)

  /** Per-key row counts (A1: `df.groupBy("userId").count()`). */
  def countsPerKey(df: DataFrame, keyCol: String,
                   outCol: String = "count"): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as(outCol))

  /** describe()-style summary (A5, `open_session.py:79`) as typed
    * deterministic aggregates instead of the stringly `describe`.
    */
  def summaryStats(df: DataFrame, c: Column): DataFrame =
    df.agg(
      count(c).as("n"),
      Det.avgRounded(c).as("mean"),
      Det.stddevRounded(c).as("stddev"),
      min(c).as("min"),
      max(c).as("max"))
}
