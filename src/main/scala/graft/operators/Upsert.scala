package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins merge — the incremental-ingestion primitive: given a
  * union of base rows and change rows carrying a version column, keep
  * exactly one row per key, the one with the highest version.
  *
  * Implemented as `max(struct(version, payload…))` in ONE grouped
  * aggregation rather than a row_number window: struct max compares
  * the version field first, and the aggregate gets map-side partial
  * combine (each input partition pre-reduces to one candidate per key
  * before the shuffle) — on an incremental load where changes are a
  * small fraction of base, almost nothing crosses the wire twice.
  * A window implementation must shuffle-sort every row.
  *
  * Versions should be unique per key (ingestion sequence numbers,
  * commit timestamps); on a tie the remaining payload fields break it
  * deterministically (field order = input column order).
  */
object Upsert {

  def latestWins(df: DataFrame, keyCols: Seq[String],
                 versionCol: String): DataFrame = {
    val payload = df.columns.filterNot(c =>
      keyCols.contains(c) || c == versionCol).toSeq
    val ordered = versionCol +: payload
    df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("_m"))
      .select(keyCols.map(col) ++ ordered.map(c => col(s"_m.$c").as(c)): _*)
  }
}
