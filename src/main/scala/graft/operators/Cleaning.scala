package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed cleaning stage (SURVEY P1–P4, P7, P8).
  *
  * The reference re-casts every column on load because SQLite is
  * dynamically typed (`ALS_model3.py:197-201`, `open_session.py:66-70`)
  * and then range-filters and null-drops. The stage is a narrow
  * (shuffle-free) select+filter that Catalyst pipelines straight into
  * the scan — at 100 TB this is the projection/predicate that must
  * reach the parquet reader, so the API takes named columns and casts
  * rather than opaque lambdas.
  */
object Cleaning {

  /** Ratings-triple cleaning (`ALS_model3.py:197-201`): project
    * (user, item, rating as int), keep lo < rating <= hi, drop nulls.
    * Column renames happen here so downstream operators never touch
    * source-specific names (the reference's hyphenated `User-ID`).
    *
    * `try_cast`, not `cast`: the contract (inherited from the
    * reference's dynamically-typed SQLite source) is failed-cast →
    * null → dropped; Spark 4's default ANSI `cast` would instead fail
    * the job on the first malformed row.
    */
  def cleanRatings(df: DataFrame, userCol: String, itemCol: String,
                   ratingCol: String, lo: Int = 0, hi: Int = 10): DataFrame =
    df.select(
        expr(s"try_cast(`$userCol` AS BIGINT)").as("userId"),
        expr(s"try_cast(`$itemCol` AS BIGINT)").as("itemId"),
        expr(s"try_cast(`$ratingCol` AS INT)").as("rating"))
      .filter(col("rating") > lo && col("rating") <= hi)
      .na.drop()

  /** Binarize a numeric column against a threshold
    * (`Model_evaluation.py:82-84`: `when(rating > 5, 1.0).otherwise(0.0)`).
    */
  def binarize(c: Column, threshold: Double): Column =
    when(c > threshold, 1.0).otherwise(0.0).cast("double")
}
