package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval builder: turn a change
  * stream keyed by (business key, effective time) into versioned rows
  * with `valid_from` / `valid_to` / `is_current` — the standard
  * warehouse shape for "what did this dimension row look like at time
  * T" joins (which then run as as-of or range joins, see
  * [[AsofJoin]] / [[RangeJoin]]).
  *
  * One keyed window (partition by business key, order by effective
  * time) — a single shuffle on the key, same scale shape as any
  * per-entity history op; no self-join.
  */
object Scd {

  /** @param changes   one row per observed version of the entity
    * @param keyCols   business key column(s)
    * @param effective the column giving each version's effective time
    * @param tieBreak  extra ordering columns for versions sharing an
    *                  effective time — REQUIRED for determinism if
    *                  duplicates are possible (e.g. a load-batch id)
    * @return input columns + `valid_to` (timestamp of the NEXT version,
    *         null if none) + `is_current`, with `effective` preserved
    *         as the version's `valid_from` under that alias
    */
  def type2(changes: DataFrame, keyCols: Seq[String], effective: String,
            tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((effective +: tieBreak).map(col): _*)
    changes
      .withColumn("valid_from", col(effective))
      .withColumn("valid_to", lead(col(effective), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
