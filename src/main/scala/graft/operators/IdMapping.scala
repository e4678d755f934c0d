package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField}

/** Dense 0-based ordinal ID assignment (SURVEY W1).
  *
  * The reference assigns contiguous int ids with
  * `row_number().over(Window.orderBy("User-ID")) - 1`
  * (`ALS_model3.py:77-85`) — a global, un-partitioned window that
  * funnels the whole dataset through ONE partition. That is the single
  * worst scale hazard in the reference (SURVEY §4 item 1).
  *
  * `denseIds` keeps the exact semantics (dense, 0-based, ordered by
  * key) but stays distributed: range-repartition by the key (total
  * order across partitions), sort within partitions, then
  * `zipWithIndex`, which computes per-partition offsets with one small
  * count job instead of a single-partition sort. On a 1000-executor
  * cluster this scales linearly; the window version does not.
  */
object IdMapping {

  /** Distinct keys of `keyCol` → (original key, dense 0-based long id
    * by ascending key). Output columns: `keyCol`, `idCol`.
    */
  def denseIds(df: DataFrame, keyCol: String, idCol: String = "mapped_id",
               partitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val keys = df.select(keyCol).na.drop().distinct()
    val ranged = partitions match {
      case Some(n) => keys.repartitionByRange(n, col(keyCol))
      case None    => keys.repartitionByRange(col(keyCol))
    }
    val sorted = ranged.sortWithinPartitions(keyCol)
    val schema = sorted.schema.add(StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** The reference's literal single-partition-window construction —
    * kept as `strictOrdinal` for small dims and as the test oracle for
    * `denseIds` (they must agree row-for-row).
    */
  def strictOrdinal(df: DataFrame, keyCol: String,
                    idCol: String = "mapped_id"): DataFrame =
    df.select(keyCol).na.drop().distinct()
      .withColumn(idCol, (row_number().over(Window.orderBy(col(keyCol))) - 1).cast("long"))

  /** Attach mapped ids to a fact table via equi-join
    * (`ALS_model3.py:205-208`). The mapping side is a dim (≤ distinct
    * keys) — broadcast it so the fact table does not shuffle.
    */
  def attach(fact: DataFrame, mapping: DataFrame, factKey: String,
             mapKey: String): DataFrame =
    fact.join(broadcast(mapping), fact(factKey) === mapping(mapKey))
}
