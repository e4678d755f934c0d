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

  /** Deterministic train/val/test assignment: the unit draw on the
    * content hash is cut at the cumulative fractions, so every row's
    * split is a pure function of its key — stable across runs,
    * engines, partitionings, and (critically) across DATASET VERSIONS:
    * a re-crawled corpus keeps every surviving document in the same
    * split, so eval sets never silently leak into train. Fractions
    * must sum to 1.
    */
  def splitAssign(df: DataFrame, keyCol: String,
                  fractions: Seq[(String, Double)],
                  salt: String = ""): DataFrame = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val u = hashDraw(col(keyCol), salt)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
    val expr = fractions.zip(cuts).init.foldRight(
      lit(fractions.last._1)) { case (((name, _), cut), elseCol) =>
      when(u < cut, name).otherwise(elseCol)
    }
    df.withColumn("split", expr)
  }

  /** Weighted sampling WITHOUT replacement, k per group
    * (Efraimidis–Spirakis A-Res): each row draws `u` from its content
    * hash and ranks by `ln(u)/w` descending — the top-k are a true
    * weight-proportional no-replacement sample, yet fully
    * deterministic and engine-replayable (same md5 draw as
    * [[hashDraw]]; the rank key is rounded to 9 decimals so the
    * ordering is identical across engines, with the key column
    * breaking exact ties). One keyed window — the per-group top-k
    * shuffle shape.
    */
  def weightedGroupSample(df: DataFrame, groupCol: String, keyCol: String,
                          weightCol: String, k: Int,
                          salt: String = ""): DataFrame = {
    val u = greatest(hashDraw(col(keyCol), salt), lit(1e-12))
    val esKey = round(log(u) / col(weightCol), 9)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(esKey.desc, col(keyCol))
    df.filter(col(weightCol) > 0)
      .withColumn("_rn", row_number().over(w))
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

  /** Deterministic upsampling to weight w ≥ 0: every row is emitted
    * floor(w) times, plus once more with probability frac(w) — by the
    * same hash-draw, so the expected multiplicity is exactly w and the
    * realized corpus is reproducible (epoch-style repetition with a
    * stable fractional epoch, the >1.0 half of [[mixStrata]]).
    * Emits a `copy` index (0-based) so downstream shuffles can
    * distinguish replicas. A narrow generator — no shuffle.
    */
  def upsample(df: DataFrame, keyCol: String, weight: Double,
               salt: String = ""): DataFrame = {
    require(weight >= 0.0, "upsample weight must be non-negative")
    val whole = math.floor(weight).toLong
    val frac = weight - whole
    val copies = (lit(whole) +
      when(hashDraw(col(keyCol), salt) < frac, 1L).otherwise(0L)).cast("int")
    // copies = 0 must yield NO rows: bare sequence(0, -1) steps down to
    // [0, -1], so guard with an empty array (same pitfall as frameSlices)
    df.withColumn("copy",
      explode(when(copies > 0, sequence(lit(0), copies - 1))
        .otherwise(array())))
  }

  /** Temperature-based source re-weighting (the T5/Llama data-mixing
    * rule): source s is sampled with probability ∝ n_s^α, flattening
    * the natural size distribution toward uniform as α → 0, so small
    * high-quality sources are not drowned by the largest crawl. Each
    * source's keep-rate is `min(1, T·p_s/n_s)` for a target corpus
    * size `T = targetFraction·N`; membership is then the usual
    * content-hash draw — reproducible and engine-replayable.
    *
    * Determinism: per-source √n are rounded to 6 digits and summed in
    * DECIMAL (a 20-source double sum would already be order-dependent);
    * every remaining step is a fixed-order scalar on per-source rows.
    * The rates frame is group-cardinality — broadcast back onto the
    * corpus, which never shuffles. Returns the kept rows with their
    * per-source `rate` attached. Only α = 0.5 is exposed (IEEE sqrt is
    * correctly rounded on every engine; pow(x, α) is not).
    */
  def temperatureMixHalf(df: DataFrame, sourceCol: String, keyCol: String,
                         targetFraction: Double,
                         salt: String = ""): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_src"))
    val tot = counts.agg(
      sum(col("n_src")).as("n_all"),
      sum(round(sqrt(col("n_src")), 6).cast(DecimalType(18, 6)))
        .cast("double").as("sum_sq"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(sourceCol),
        least(lit(1.0),
          lit(targetFraction) * col("n_all") *
            (round(sqrt(col("n_src")), 6) / col("sum_sq")) / col("n_src"))
          .as("rate"))
    df.join(broadcast(rates), sourceCol)
      .filter(hashDraw(col(keyCol), salt) < col("rate"))
  }

  /** Deterministic shard assignment: shard i of n by a content-hash of
    * the key, so a document lands on the same training shard across
    * runs, engines, and corpus versions (the writing face of
    * [[splitAssign]]). A 16-bit md5 prefix mod n is uniform for the
    * shard counts that matter (n ≪ 65536); `df.write.partitionBy` on
    * the result gives stable shard files. Narrow — no shuffle.
    */
  def shardAssign(df: DataFrame, keyCol: String, nShards: Int,
                  salt: String = ""): DataFrame = {
    require(nShards > 0 && nShards <= 4096, "nShards must be in [1, 4096]")
    df.withColumn("shard",
      (conv(substring(md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 4),
        16, 10).cast("long") % nShards).cast("int"))
  }

  /** Deterministic PRETRAINING ORDER: [[shardAssign]]'s shard plus the
    * document's position WITHIN its shard, ordered by the full
    * content-hash draw (tie-break on the key) — a reproducible global
    * pseudo-random permutation of the corpus. Training-data order is
    * part of a pretraining run's recipe; `rand(seed)`-based shuffles
    * are partition-layout-dependent and unreplayable across engines,
    * while (shard, pos) here is a pure function of the key: stable
    * across runs, engines, cluster sizes and corpus versions
    * (documents added later change positions only AFTER their hash
    * draw, like a consistent-hash ring).
    *
    * Scale: ONE exchange — the window's hash partitioning on `shard`,
    * which then doubles as the clustering for the per-shard ordered
    * write; per-task sort is bounded by the shard size n/nShards, and
    * nShards grows with the corpus by contract (it is the output file
    * count), so no shard outgrows an executor.
    */
  def pretrainOrder(df: DataFrame, keyCol: String, nShards: Int,
                    salt: String = ""): DataFrame =
    shardAssign(df, keyCol, nShards, salt)
      .withColumn("_draw",
        md5(concat(col(keyCol).cast("string"), lit(salt))))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("_draw"), col(keyCol))))
      .drop("_draw")

  /** Dedup-aware split report: split by the near-dup CLUSTER id, not
    * the document id, so near-duplicates can never straddle
    * train/val/test (hashing doc ids leaks paraphrases of train docs
    * into eval — the contamination mode exact-dedup misses). Takes the
    * (id, cluster) labels from [[Dedup.dupClusters]]; buckets the
    * cluster id mod `nBuckets` (< `trainUpTo` → train, == → val,
    * rest → test — pure integer arithmetic, replayable in any
    * engine). Emits one row per split: (split, n_docs, n_clusters,
    * leak_free) where leak_free VERIFIES (not assumes) that no cluster
    * spans two splits — a 1-row broadcast joined onto the 3-row
    * report.
    */
  def dedupAwareSplit(clusters: DataFrame, idCol: String,
                      clusterCol: String, nBuckets: Int = 10,
                      trainUpTo: Int = 8): DataFrame = {
    require(nBuckets >= 2 && trainUpTo >= 1 && trainUpTo < nBuckets,
      "need train < val < test bucket ranges")
    val withSplit = clusters.withColumn("split",
      when(pmod(col(clusterCol), lit(nBuckets)) < trainUpTo, "train")
        .when(pmod(col(clusterCol), lit(nBuckets)) === trainUpTo, "val")
        .otherwise("test"))
    val leakFree = withSplit
      .groupBy(col(clusterCol))
      .agg(countDistinct(col("split")).as("_nsp"))
      .agg((coalesce(max(col("_nsp")), lit(0L)) <= 1L).cast("int")
        .as("leak_free"))
    withSplit.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col(clusterCol)).as("n_clusters"))
      .crossJoin(broadcast(leakFree))
  }

  /** Token-budget MIXTURE PLAN (the Dolma/Pile mixing calculator):
    * given target mixture `weights` per source and a total token
    * `budget`, compute for each source how many tokens the corpus
    * offers, how many the mixture wants, the realizable sampling rate
    * (an epoch count when > 1, CAPPED at `maxEpochs` — feed it
    * directly into [[mixStrata]] / [[upsample]] / [[realizeMixture]]'s
    * construction, no further clamping needed), and whether the source
    * can meet its target under the repetition cap.
    *
    * Weights are normalized ONCE here, in Scala, by their key-sorted
    * sum (`weight` in the output is the normalized mixture share), so
    * an external replay never re-derives the floating-point weight sum
    * — summation order and a near-1.0 total would otherwise make
    * `floor()` boundaries engine-dependent. All targets are integer
    * token counts via `floor` and the rate is the exact double
    * division, NOT rounded: at real corpus scale a big source's rate
    * can be < 1e-6 and a 6-digit round would zero it. One aggregation
    * over the corpus; the weights ride a broadcast literal map.
    * Output: `(source, n_docs, avail_tokens, weight, target_tokens,
    * rate, epochs, planned_tokens, deficit)`.
    *
    * NOTE on column semantics (changed round 8): `weight` reports the
    * NORMALIZED mixture share `v / Σw` — not the caller's raw weight
    * (the API accepts weights that don't sum to 1) — and `rate` is
    * emitted already CLAMPED to `maxEpochs`. `target_tokens` is
    * `floor(normalized_weight · budget)`, which can differ by 1 token
    * from a `floor(raw·budget/Σw)` replay at exact floor boundaries.
    */
  def mixturePlan(docs: DataFrame, sourceCol: String, textCol: String,
                  weights: Map[String, Double], budget: Long,
                  maxEpochs: Int = 4): DataFrame =
    mixturePlanFromStats(
      docs.select(col(sourceCol).as("source"),
          size(split(col(textCol), " ")).cast("long").as("_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("_tok")).as("avail_tokens")),
      weights, budget, maxEpochs)

  /** [[mixturePlan]] from a PRE-AGGREGATED availability table
    * `(source, n_docs, avail_tokens)` — the incremental face: a
    * continuously-ingesting pipeline maintains per-source running
    * stats (O(sources) rows, updated per batch) and re-plans from
    * them without ever re-scanning the corpus
    * ([[graft.streaming.CurationStream]]).
    */
  def mixturePlanFromStats(stats: DataFrame,
                           weights: Map[String, Double], budget: Long,
                           maxEpochs: Int = 4): DataFrame = {
    require(weights.values.forall(_ >= 0.0) && weights.values.sum > 0.0,
      "weights must be non-negative with a positive sum")
    require(budget > 0 && maxEpochs >= 1, "need a positive budget and cap")
    // key-sorted sum: Map iteration order is insertion-dependent past
    // 4 entries and double addition is not associative
    val sorted = weights.toSeq.sortBy(_._1)
    val wsum = sorted.map(_._2).sum
    // full outer against the weight table: a weighted source with NO
    // documents is the most extreme deficit there is and must appear
    // as a (0 avail, deficit=1) row, not silently vanish
    val w = stats.sparkSession
      .createDataFrame(sorted.map { case (k, v) => (k, v / wsum) })
      .toDF("source", "weight")
    stats
      .join(w, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("avail_tokens"), lit(0L)).as("avail_tokens"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
      .withColumn("target_tokens",
        floor(col("weight") * lit(budget)).cast("long"))
      .withColumn("rate", when(col("avail_tokens") > 0,
        least(col("target_tokens").cast("double") / col("avail_tokens"),
          lit(maxEpochs.toDouble)))
        .otherwise(lit(0.0)))
      .withColumn("epochs", when(col("avail_tokens") > 0,
        least(ceil(col("rate")), lit(maxEpochs.toLong)))
        .otherwise(lit(0L)).cast("int"))
      .withColumn("planned_tokens",
        least(col("target_tokens"), col("avail_tokens") * maxEpochs))
      .withColumn("deficit",
        (col("target_tokens") > col("planned_tokens")).cast("int"))
  }

  /** REALIZE a [[mixturePlan]]: emit each document
    * `floor(rate) + Bernoulli(frac(rate))` times (the [[upsample]]
    * construction, per source) and report the achieved composition
    * against the plan — the end-to-end check that the calculator's
    * rates actually materialize the intended token mixture. The plan
    * is a per-source handful of rows and rides a broadcast join; the
    * copy count is a narrow projection — one corpus pass, one
    * aggregation. Deterministic: the extra-copy draw is the md5 hash
    * of the doc id, so the realized corpus (and this report) replays
    * bit-identically in any engine. Output: `(source, n_docs,
    * n_rows_out, realized_tokens, planned_tokens, rel_err)`.
    */
  def realizeMixture(docs: DataFrame, idCol: String, sourceCol: String,
                     textCol: String, weights: Map[String, Double],
                     budget: Long, maxEpochs: Int = 4,
                     salt: String = ""): DataFrame = {
    val plan = mixturePlan(docs, sourceCol, textCol, weights, budget,
        maxEpochs)
      .select(col("source"), col("rate").as("_r"), col("planned_tokens"))
    val realized = docs
      .select(col(idCol).as("_id"), col(sourceCol).as("source"),
        size(split(col(textCol), " ")).cast("long").as("_tok"))
      .join(broadcast(plan.drop("planned_tokens")), Seq("source"))
      .withColumn("_whole", floor(col("_r")).cast("long"))
      .withColumn("_extra",
        (hashDraw(col("_id"), salt) < (col("_r") - col("_whole"))).cast("long"))
      .withColumn("_copies", col("_whole") + col("_extra"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_copies")).as("n_rows_out"),
        sum(col("_tok") * col("_copies")).as("realized_tokens"))
    // plan-driven, not corpus-driven: a weighted source with no
    // documents still reports its (0 realized, planned) deficit row
    plan.join(realized, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_rows_out"), lit(0L)).as("n_rows_out"),
        coalesce(col("realized_tokens"), lit(0L)).as("realized_tokens"),
        col("planned_tokens"))
      .withColumn("rel_err",
        round(abs(col("realized_tokens") - col("planned_tokens"))
          .cast("double") / greatest(col("planned_tokens"), lit(1L)), 4))
  }
}
