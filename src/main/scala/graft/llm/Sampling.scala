package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `rand(seed)` is partitioning-dependent: the same row draws a
  * different value when the file split or task layout changes, so a
  * sampled corpus is not reproducible across runs or clusters — and
  * not auditable by an external engine. These operators key every draw
  * on a CONTENT hash (md5 of the key column), so membership is a pure
  * function of the row: stable under repartitioning, resumable after
  * failure, and replayable in any engine with md5 (the DuckDB oracles
  * replay it verbatim).
  *
  * Scale design: all three are single-pass narrow filters (no shuffle)
  * except [[groupSample]], which shuffles once on the group key for
  * its window — the same cost as any per-group top-k.
  */
object Sampling {

  /** Uniform [0,1) draw per key: top-32-bit md5 prefix / 2^32.
    * Salting makes draws independent across uses of the same key.
    */
  def hashDraw(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** Keep rows whose hash-draw falls under `fraction` — a reproducible
    * Bernoulli sample on the key column.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = ""): DataFrame =
    df.filter(hashDraw(col(keyCol), salt) < fraction)

  /** Exactly min(k, |group|) rows per group, selected by hash order —
    * a deterministic per-group uniform sample without replacement
    * (hash order is uncorrelated with any data order; the key column
    * breaks md5 ties for full determinism).
    */
  def groupSample(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }

  /** Weighted corpus mixing: per-stratum keep-fractions over one frame
    * (the "rebalance sources/languages" pipeline step). Weight 1.0
    * keeps a stratum whole; unlisted strata get `default`. The draw is
    * salted with the stratum value so the same key is sampled
    * independently in different strata. Weights > 1.0 (upsampling) are
    * out of scope — they need row replication, not filtering.
    */
  def mixStrata(df: DataFrame, strataCol: String, keyCol: String,
                weights: Map[String, Double],
                default: Double = 0.0): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      "mixStrata weights must be in [0, 1]")
    val frac = weights.foldLeft(lit(default)) { case (acc, (k, w)) =>
      when(col(strataCol) === k, lit(w)).otherwise(acc)
    }
    df.filter(
      hashDraw(concat(col(keyCol).cast("string"), lit(":"), col(strataCol))) < frac)
  }
}
