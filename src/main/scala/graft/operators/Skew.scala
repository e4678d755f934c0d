package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins whose key distribution is heavy-
  * tailed and whose dimension side is too large to broadcast.
  *
  * A plain shuffle join routes every fact row with a hot key to ONE
  * reducer — at 100 TB a single celebrity key can hold a 1000-executor
  * cluster hostage. [[saltedJoin]] splits each key's fact rows across
  * `saltFactor` sub-partitions (salt = deterministic hash of the fact
  * row, NOT `rand()` — reruns and speculative retries must route rows
  * identically) and replicates each dimension row `saltFactor` times,
  * joining on (key, salt). Result set is EXACTLY the plain join's
  * (verified by the q60 oracle, which IS the plain join in SQL);
  * reducer load per key drops by saltFactor at the cost of a
  * saltFactor× blow-up of the (small-by-assumption) dimension side.
  *
  * AQE's skew-join split handles most cases adaptively; explicit
  * salting remains the tool when AQE cannot help — e.g. a skewed
  * aggregation-input join feeding a single monster partition inside
  * one stage, or engines/pipelines where AQE is off.
  */
object Skew {

  /** Inner equi-join of `fact` and `dim` on `key`, salted
    * `saltFactor` ways. `saltOn` picks the fact columns hashed into
    * the salt (default: the whole row via all fact columns — any
    * stable subset works; MUST be fact-side columns).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int, saltOn: Seq[Column] = Nil): DataFrame = {
    val saltSrc = if (saltOn.nonEmpty) saltOn else fact.columns.map(col).toSeq
    val f = fact.withColumn("_salt", pmod(hash(saltSrc: _*), lit(saltFactor)))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  /** Exact COUNT(DISTINCT v) per hot key without a per-key reducer
    * bottleneck: salt on a hash OF THE DISTINCT VALUE, so the salt
    * PARTITIONS each key's value domain — per-(key, salt) distinct
    * sets are disjoint and their counts ADD exactly. (Salting on the
    * row, as a join would, is WRONG here: the same value lands in
    * several salts and the sum over-counts.) Stage 1 spreads every
    * key over `saltFactor` reducers; stage 2 merges `saltFactor`
    * longs per key. Count-distinct is the aggregate that needs this:
    * sums/counts already combine map-side, but distinct sets cannot
    * partially combine across arbitrary row splits.
    */
  def saltedDistinct(df: DataFrame, keyCol: String, valueCol: String,
                     saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    df.select(col(keyCol), col(valueCol),
        pmod(hash(col(valueCol)), lit(saltFactor)).as("_salt"))
      .groupBy(col(keyCol), col("_salt"))
      .agg(countDistinct(col(valueCol)).as("_d"))
      .groupBy(col(keyCol))
      .agg(sum(col("_d")).as("n_distinct"))
  }
}
