package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-group randomized splits (SURVEY W2 / M8).
  *
  * All three reference split flavors are the same shape: a per-user
  * window ordered by seeded `rand`, then a predicate on `row_number`
  * (`ALS_model3.py:100-107,222-225`, `Model_evaluation.py:58-63`).
  * The window partitions by user, so it scales: each group sorts
  * independently inside its shuffle partition; no global sort, no
  * single-partition funnel. Skewed users are bounded by the largest
  * single group, and AQE skew-join handling covers the downstream
  * joins.
  *
  * Determinism: `rand(seed)` is seeded per-partition, so exact row
  * placement depends on the partitioning; COUNTS per group do not.
  * Tests pin invariants (test=1 per user; fold sizes are a function of
  * group size only), matching SURVEY §7.4's guidance.
  */
object Splits {

  private def rankedByRand(df: DataFrame, groupCol: String, seed: Long) =
    df.withColumn("rn",
      row_number().over(Window.partitionBy(col(groupCol)).orderBy(rand(seed))))

  /** Leave-one-out: exactly one row per group marked test
    * (`ALS_model3.py:222-225`: test = rn==1, train = rn>1).
    * Adds boolean `is_test`, drops the helper rank.
    */
  def leaveOneOut(df: DataFrame, groupCol: String, seed: Long = 42L): DataFrame =
    rankedByRand(df, groupCol, seed)
      .withColumn("is_test", col("rn") === 1)
      .drop("rn")

  /** Top-N holdout per group (`Model_evaluation.py:58-63`: rn <= n). */
  def holdoutN(df: DataFrame, groupCol: String, n: Int, seed: Long = 42L): DataFrame =
    rankedByRand(df, groupCol, seed)
      .withColumn("is_test", col("rn") <= n)
      .drop("rn")

  /** Per-group k-fold assignment with an eligibility floor
    * (`ALS_model3.py:89-107`): groups with ≥ `minRows` rows get
    * `fold = rn % k`; smaller groups get fold −1 (always-train — the
    * reference achieves this by omission; −1 makes it explicit).
    */
  def foldAssign(df: DataFrame, groupCol: String, k: Int, minRows: Int,
                 seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_grp_n"))
    rankedByRand(df, groupCol, seed)
      .join(counts, Seq(groupCol))
      .withColumn("fold",
        when(col("_grp_n") >= minRows, (col("rn") % k).cast("int"))
          .otherwise(lit(-1).cast("int")))
      .drop("rn", "_grp_n")
  }
}
