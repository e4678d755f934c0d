package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the data-ops audit primitive: given two versions of
  * a keyed table, classify every key as added / removed / changed /
  * same. One full-outer equi-join on the key (shuffle on both sides,
  * the minimum possible for this semantics); comparison columns are
  * checked null-safely so NULL→value and value→NULL transitions count
  * as changes, not matches.
  */
object Diff {

  /** @param compareCols columns whose null-safe inequality marks a key
    *                     as 'changed'
    * @return key columns + `change` + `<col>_old` / `<col>_new` pairs
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val o = compareCols.foldLeft(oldDf.select((keys ++ compareCols).map(col): _*)) {
      (df, c) => df.withColumnRenamed(c, s"${c}_old")
    }.withColumn("_in_old", lit(true))
    val n = compareCols.foldLeft(newDf.select((keys ++ compareCols).map(col): _*)) {
      (df, c) => df.withColumnRenamed(c, s"${c}_new")
    }.withColumn("_in_new", lit(true))
    val joined = o.join(n, keys, "full_outer")
    val anyChanged: Column = compareCols
      .map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduce(_ || _)
    joined.withColumn("change",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(anyChanged, "changed")
          .otherwise("same"))
      .select((keys.map(col) :+ col("change")) ++
        compareCols.flatMap(c => Seq(col(s"${c}_old"), col(s"${c}_new"))): _*)
  }
}
