package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dense 0-based ordinal ID assignment (SURVEY W1).
  *
  * The reference assigns contiguous int ids with
  * `row_number().over(Window.orderBy("User-ID")) - 1`
  * (`ALS_model3.py:77-85`) — a global, un-partitioned window that
  * funnels the whole dataset through ONE partition. That is the single
  * worst scale hazard in the reference (SURVEY §4 item 1).
  *
  * `denseIds` keeps the exact semantics (dense, 0-based, ordered by
  * key) fully inside Tungsten/codegen:
  *   1. distinct keys → `repartitionByRange(key)`: total order across
  *      partitions, one shuffle of the (small) key dim;
  *   2. `sortWithinPartitions` + `monotonically_increasing_id`, whose
  *      bit layout (partition id << 33 | row offset) yields the
  *      per-partition ordinal with NO second shuffle and no window;
  *   3. per-partition counts (≤ numPartitions rows) → cumulative
  *      offsets → broadcast join back.
  * On a 1000-executor cluster every step is either embarrassingly
  * parallel or operates on a numPartitions-sized side table. The
  * round-1 version dropped to RDD `zipWithIndex` (two encoder
  * round-trips outside codegen); this one never leaves DataFrames.
  */
object IdMapping {

  /** Distinct keys of `keyCol` → (original key, dense 0-based long id
    * by ascending key). Output columns: `keyCol`, `idCol`.
    */
  def denseIds(df: DataFrame, keyCol: String, idCol: String = "mapped_id",
               partitions: Option[Int] = None): DataFrame = {
    val keys = df.select(keyCol).na.drop().distinct()
    val ranged = partitions match {
      case Some(n) => keys.repartitionByRange(n, col(keyCol))
      case None    => keys.repartitionByRange(col(keyCol))
    }
    // monotonically_increasing_id packs (partitionId << 33 | rowOffset);
    // after the in-partition sort the offset IS the local ordinal.
    val mid = ranged.sortWithinPartitions(keyCol)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftrightunsigned(col("_mid"), 33))
      .withColumn("_rn", col("_mid").bitwiseAND(lit((1L << 33) - 1)))
    // Per-partition counts: ≤ numPartitions rows — the window below
    // runs on that tiny frame, not on the data.
    val offsets = mid.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .withColumn("_offset",
        coalesce(
          sum(col("_n")).over(
            Window.orderBy(col("_pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_pid"), col("_offset"))
    mid.join(broadcast(offsets), Seq("_pid"))
      .withColumn(idCol, col("_offset") + col("_rn"))
      .select(col(keyCol), col(idCol))
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
    * (`ALS_model3.py:205-208`).
    *
    * The mapping side is the distinct-key set of the fact table —
    * small for dims, but potentially billions of keys at 100 TB, so an
    * unconditional `broadcast()` is a driver-OOM hazard (round-1
    * finding). The hint is now gated on Catalyst's own size estimate;
    * above the threshold the planner (with AQE) picks the strategy,
    * which at scale is a co-partitioned shuffle join.
    */
  def attach(fact: DataFrame, mapping: DataFrame, factKey: String,
             mapKey: String,
             broadcastThreshold: Long = 128L << 20): DataFrame = {
    val est = mapping.queryExecution.optimizedPlan.stats.sizeInBytes
    val m = if (est.isValidLong && est.toLong <= broadcastThreshold)
      broadcast(mapping) else mapping
    fact.join(m, fact(factKey) === mapping(mapKey))
  }
}
