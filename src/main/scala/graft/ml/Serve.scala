package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Popularity, TopK}

/** Serving pipeline (SURVEY EP2, `recommendations3.py`), DataFrame-
  * native end-to-end.
  *
  * The reference collects recommendations to pandas at `:77` and does
  * top-k, first-seen dedup, popularity-fallback fill, and wide-format
  * pivot in driver Python loops (`:100-177`). Every step here stays
  * distributed: the fallback is a bounded crossJoin (|users| × pool
  * size, both small by construction), the fill is
  * [[TopK.fillToK]]'s tiered window, and the wide format is a BOUNDED
  * pivot (k columns — never the reference's 77k-user pivot hazard).
  */
object Serve {

  /** Top-k per user with popularity fallback: ALS recs win (tier 0),
    * the count-based popular pool pads short lists (tier 1), each user
    * ends with exactly k ranked items.
    */
  def topKWithFallback(model: org.apache.spark.ml.recommendation.ALSModel,
                       users: DataFrame, ratings: DataFrame,
                       k: Int, poolSize: Int = 50): DataFrame = {
    val recs = Als.explodeRecs(Als.recommendSubset(model, users, k))
      .select(col("userId"), col("itemId"),
        col("predicted_rating").cast("double").as("score"))
    val pool = Popularity.topByCount(ratings, "itemId", poolSize)
      .select(col("itemId"), col("num_ratings").cast("double").as("score"))
    val fallback = users.select(col("userId").cast("int").as("userId"))
      .crossJoin(broadcast(pool))
    TopK.fillToK(recs, fallback, "userId", "itemId", "score", k)
  }

  /** Attach a title/metadata dim (J4: explicit broadcast — the dim is
    * small by contract, `recommendations3.py:73`).
    */
  def withTitles(recs: DataFrame, titles: DataFrame, itemKey: String,
                 titleCol: String): DataFrame =
    recs.join(broadcast(titles), recs("itemId") === titles(itemKey))
      .select(recs("userId"), recs("itemId"), recs("rank"),
        titles(titleCol).as("title"))

  /** Wide export (`recommendations3.py:156-177`): one row per user,
    * `item_1 … item_k` columns. Bounded pivot — exactly k columns.
    */
  def wide(ranked: DataFrame, k: Int, valueCol: String = "itemId"): DataFrame = {
    val p = ranked.groupBy(col("userId"))
      .pivot("rank", (1 to k).map(i => i: Integer))
      .agg(first(col(valueCol)))
    (1 to k).foldLeft(p)((df, i) => df.withColumnRenamed(i.toString, s"item_$i"))
  }
}
