package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-group top-k, first-seen dedup, and tiered fallback fill
  * (SURVEY T4, U1, and the `recommendations3.py:100-151` driver-side
  * pandas loop rewritten as DataFrames).
  *
  * The reference collects all recommendations to the driver and loops
  * in Python to (a) take top-k per user, (b) dedup titles first-seen,
  * (c) fill short lists from a popularity pool. All three are window/
  * union shapes that scale: partitioned windows sort only within a
  * group, and the fallback is a `unionByName` with a tier column —
  * no driver materialization at any size.
  */
object TopK {

  /** Top-k rows per group by `orderCols` (first column list wins ties
    * in order). Adds `rank` (1-based) to the output.
    */
  def perGroup(df: DataFrame, groupCol: String, orderCols: Seq[Column],
               k: Int): DataFrame =
    df.withColumn("rank",
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)))
      .filter(col("rank") <= k)

  /** First-seen dedup by `dupCol` within a group, "seen" order given by
    * `orderCols` (U1: `dict.fromkeys` / seen-set semantics,
    * `recommendations3.py:91,110-140`).
    */
  def dedupFirstSeen(df: DataFrame, groupCol: String, dupCol: String,
                     orderCols: Seq[Column]): DataFrame =
    df.withColumn("_dup_rn",
        row_number().over(
          Window.partitionBy(col(groupCol), col(dupCol)).orderBy(orderCols: _*)))
      .filter(col("_dup_rn") === 1)
      .drop("_dup_rn")

  /** Tiered fill: primary rows win, fallback rows pad each group to
    * exactly k (SURVEY §4 item 4's rewrite of the pandas fill loop).
    * Both inputs must share (groupCol, itemCol, scoreCol). Fallback
    * rows already present in primary (same item) are dropped first.
    */
  def fillToK(primary: DataFrame, fallback: DataFrame, groupCol: String,
              itemCol: String, scoreCol: String, k: Int): DataFrame = {
    val p = primary.select(col(groupCol), col(itemCol), col(scoreCol))
      .withColumn("tier", lit(0))
    val f = fallback.select(col(groupCol), col(itemCol), col(scoreCol))
      .withColumn("tier", lit(1))
      .join(p.select(col(groupCol), col(itemCol)), Seq(groupCol, itemCol), "left_anti")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("tier"), col(scoreCol).desc, col(itemCol))
    p.unionByName(f)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
