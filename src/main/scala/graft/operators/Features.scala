package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Supervised feature engineering and experiment statistics.
  *
  * Both operators follow the [[graft.functions.Det]] discipline: every
  * distributed aggregation runs exactly (integer or decimal sums), and
  * floating point only appears in per-row/per-group scalar expressions
  * with a fixed operation order — so results are bit-reproducible
  * across partitionings and replayable by an external SQL engine.
  */
object Features {

  /** Leave-one-out target encoding: each row's category is encoded as
    * the mean target of OTHER rows in the category,
    * `(Σ target − target) / (n − 1)` — the standard leakage-free mean
    * encoding for supervised training (plain mean encoding leaks each
    * row's own label into its feature). Singleton categories encode
    * NULL. One hash aggregation on the category plus a broadcast-sized
    * join back; the fact stream never shuffles twice.
    */
  def looTargetEncode(df: DataFrame, catCol: String, targetCol: Column,
                      outCol: String = "enc", digits: Int = 6): DataFrame = {
    val t = targetCol.cast("long")
    val stats = df.groupBy(col(catCol))
      .agg(sum(t).as("_sum_t"), count(lit(1)).as("_n_t"))
    df.join(stats, catCol)
      .withColumn(outCol,
        when(col("_n_t") > 1,
          round((col("_sum_t") - t).cast("double") / (col("_n_t") - 1), digits)))
      .drop("_sum_t", "_n_t")
  }

  /** Pairwise Welch t-tests between all group pairs (a < b) of
    * `valueCol` (≤2 fractional digits): the unequal-variance A/B test.
    * Per-group moments are EXACT decimal sums (one aggregation, any
    * partitioning); the t statistic and Welch–Satterthwaite degrees of
    * freedom are closed-form scalar double ops on the tiny group-stats
    * frame. Output: `(type_a, type_b, n_a, n_b, t_welch, dof)`.
    */
  def welchPairs(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val d2 = col(valueCol).cast(DecimalType(18, 2))
    val g = df.groupBy(col(groupCol).as("grp"))
      .agg(count(col(valueCol)).as("n"),
        sum(d2).cast("double").as("s1"),
        sum(d2 * d2).cast("double").as("s2"))
      .select(col("grp"), col("n"),
        (col("s1") / col("n")).as("m"),
        // sample variance from exact sums; all-equal groups give 0
        ((col("s2") - col("s1") * col("s1") / col("n")) /
          (col("n").cast("double") - lit(1.0))).as("v"))
    val a = g.select(col("grp").as("type_a"), col("n").as("n_a"),
      col("m").as("m_a"), col("v").as("v_a"))
    val b = g.select(col("grp").as("type_b"), col("n").as("n_b"),
      col("m").as("m_b"), col("v").as("v_b"))
    a.join(b, col("type_a") < col("type_b"))
      .withColumn("se_a", col("v_a") / col("n_a"))
      .withColumn("se_b", col("v_b") / col("n_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        round((col("m_a") - col("m_b")) / sqrt(col("se_a") + col("se_b")), 4)
          .as("t_welch"),
        round((col("se_a") + col("se_b")) * (col("se_a") + col("se_b")) /
          (col("se_a") * col("se_a") / (col("n_a").cast("double") - lit(1.0)) +
            col("se_b") * col("se_b") / (col("n_b").cast("double") - lit(1.0))),
          2).as("dof"))
  }
}
