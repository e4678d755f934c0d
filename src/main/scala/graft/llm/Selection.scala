package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.TopKAgg

/** Targeted data SELECTION for pretraining corpora — which documents
  * to keep, not just which are duplicates.
  *
  * Two public-literature shapes:
  *
  *   - '''DSIR''' (Data Selection via Importance Resampling, Xie et
  *     al. 2023, arXiv:2302.03169): estimate hashed n-gram bag-of-
  *     words language models on a TARGET slice (the distribution you
  *     want more of) and on the RAW corpus, score every raw document
  *     with its log importance weight `log p_target(x) − p_raw(x)`,
  *     and resample with Gumbel-top-k — the standard trick that turns
  *     weighted sampling WITHOUT replacement into a plain top-k over
  *     perturbed scores.
  *   - '''Diversity-preserving downsampling''': cap each SimHash
  *     bucket at a per-bucket quota so the kept sample spans content
  *     space instead of following the corpus's topic skew (the
  *     cluster-balanced shape of SemDeDup-style curation, on the
  *     cheap deterministic sketch the engine already has).
  *
  * Scale design (the 100 TB shape):
  *   - The only corpus-sized passes are the bigram feature stream
  *     (explode + one hash aggregation keyed on the hashed bucket)
  *     and the per-document weight sum (one aggregation keyed on
  *     doc_id). The feature-distribution tables are BUCKET-sized
  *     (≤ `buckets` rows, default 1024) regardless of corpus size and
  *     ride broadcast joins; the scalar totals are a 1-row broadcast.
  *   - Resampling is a `TakeOrderedAndProject` top-k (map-side k rows
  *     per partition, never a global sort) and the diversity cap a
  *     bounded native top-k aggregation ([[graft.operators.TopKAgg]]) —
  *     no window sort over the corpus.
  *
  * Determinism (the [[graft.functions.Det]] discipline): every draw
  * and hash is md5-keyed on row content, log-ratios are rounded to 6
  * digits and summed exactly in decimal, so results are independent
  * of partitioning and replayable bit-for-bit by an external engine
  * (the DuckDB oracles replay every formula verbatim).
  */
object Selection {

  /** Per-document hashed-bigram feature stream `(doc_id, b)`, one row
    * per bigram OCCURRENCE, `b = md5_top32(bigram) mod buckets`.
    * Documents with fewer than two tokens emit nothing (no bigram
    * features to score — the [[LangModel]] convention).
    */
  private def featureStream(docs: DataFrame, idCol: String, textCol: String,
                            buckets: Int, extra: Column*): DataFrame = {
    val toks = docs.select(
      (col(idCol).as("doc_id") +: extra :+
        split(col(textCol), " ").as("_toks")): _*)
    toks.withColumn("bigram",
        explode(graft.functions.TextExprs.wordNgrams(col("_toks"), 2)))
      .withColumn("b",
        conv(substring(md5(col("bigram")), 1, 8), 16, 10).cast("long")
          % buckets)
      .drop("_toks", "bigram")
  }

  /** DSIR log importance weights. Fits add-one-smoothed hashed-bigram
    * bag models on the `targetFilter` slice and on the whole input,
    * then scores every document:
    *
    * {{{
    * lr[b]    = ln( ((ct[b]+1)·(Nr+B)) / ((cr[b]+1)·(Nt+B)) )   (rounded 6)
    * log_w(d) = Σ_{bigram ∈ d} lr[bucket(bigram)]               (exact decimal sum, rounded 4)
    * }}}
    *
    * where `ct`/`cr` are target/raw bucket counts, `Nt`/`Nr` their
    * totals and `B = buckets`. Documents whose features look like the
    * target slice score high; boilerplate unlike the target scores
    * negative. Output: `(doc_id, n_feats, log_w)` — one row per
    * document with ≥ 2 tokens.
    *
    * Scale: two bucket-keyed aggregations over the feature stream
    * (map-side partial, output ≤ B rows each), a B-row broadcast join
    * back onto the stream, one doc-keyed aggregation. Nothing driver-
    * sided; the target slice is a predicate, not a second scan.
    */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
                     targetFilter: Column, buckets: Int = 1024): DataFrame = {
    val bg = featureStream(docs, idCol, textCol, buckets,
      targetFilter.as("_ref"))
    val cr = bg.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val ct = bg.filter(col("_ref")).groupBy(col("b"))
      .agg(count(lit(1)).as("ct"))
    val counts = cr.join(ct, Seq("b"), "left")
      .select(col("b"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val tot = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    // every factor cast to double BEFORE the multiply: overflow-safe
    // at any corpus size (counts ≤ 2^53 stay exact) and the exact op
    // shape the oracle replays
    val lr = counts.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log(
          ((col("ct") + 1).cast("double") *
            (col("nr") + buckets).cast("double")) /
          ((col("cr") + 1).cast("double") *
            (col("nt") + buckets).cast("double"))), 6).as("lr"))
    bg.join(broadcast(lr), Seq("b"))
      .select(col("doc_id"), col("lr").cast(DecimalType(18, 6)).as("lr"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("lr")).cast("double"), 4).as("log_w"))
  }

  /** Gumbel-top-k importance resample: keep the `k` documents with the
    * largest `log_w + Gumbel(doc_id)`, the exact sampling-without-
    * replacement scheme DSIR uses (Gumbel-max trick: adding i.i.d.
    * Gumbel noise to log-weights and taking the top-k draws k docs
    * with probability proportional to their weights).
    *
    * The Gumbel draw is deterministic and content-keyed:
    * `u = (md5_top32(doc_id·salt) + 0.5) / 2^32 ∈ (0,1)` (the +0.5
    * keeps `ln` finite and the value an exact dyadic rational in both
    * engines), `g = −ln(−ln u)` rounded to 6. Output:
    * `(doc_id, log_w, skey)` for the k winners,
    * `skey = round(log_w + g, 6)`; ties broken on doc_id.
    *
    * Scale: weights as [[dsirLogWeights]]; the selection itself is
    * `ORDER BY skey DESC LIMIT k` — Spark plans a
    * `TakeOrderedAndProject` (per-partition bounded heaps, no global
    * sort), safe at any corpus size for driver-sized k.
    */
  def dsirResample(docs: DataFrame, idCol: String, textCol: String,
                   targetFilter: Column, k: Int, buckets: Int = 1024,
                   salt: String = "dsir"): DataFrame = {
    val w = dsirLogWeights(docs, idCol, textCol, targetFilter, buckets)
    val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(salt))), 1, 8), 16, 10).cast("long") + 0.5) / 4294967296.0
    w.select(col("doc_id"), col("log_w"),
        round(col("log_w") + round(-log(-log(u)), 6), 6).as("skey"))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(k)
  }

  /** Token-budget curriculum selection: keep the highest-`scoreCol`
    * rows until their cumulative `costCol` reaches `budget` — the
    * "best docs first, stop at N tokens" step that turns a scored
    * corpus into a sized training set.
    *
    * Greedy-by-score at VALUE granularity, never a global per-row
    * rank (the 100 TB discipline of [[LangModel.refPerplexityBuckets]]):
    *
    *  1. a (score value → Σcost) histogram + one cumulative window
    *     over it (histogram-sized — thousands-to-millions of rows
    *     whatever the corpus) finds the overflow value `s*` and the
    *     budget remaining before it;
    *  2. every row with score > `s*` is kept outright;
    *  3. the BOUNDARY bucket (score == `s*`) is refined the same way
    *     one level down: a histogram over the md5 content draw rounded
    *     to 6 digits, cumulative, keep whole draw-buckets while they
    *     fit — so the boundary fill is deterministic and partitioning-
    *     independent, and the undershoot is bounded by one draw-bucket
    *     (~1e-6 of the boundary mass), not by the score granularity.
    *
    * Output: the kept rows as `(idCol, score, cost)`. Total kept cost
    * ≤ budget always; if the budget covers everything, everything is
    * kept.
    */
  def budgetSelect(scored: DataFrame, idCol: String, scoreCol: String,
                   costCol: String, budget: Long,
                   salt: String = "budget"): DataFrame = {
    val s = scored.select(col(idCol), col(scoreCol).as("score"),
      col(costCol).cast("long").as("cost"))
    val hist = s.groupBy(col("score")).agg(sum(col("cost")).as("_c"))
    val cum = hist.withColumn("_cum",
      sum(col("_c")).over(Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, 0)))
    // s* = first score value whose cumulative cost overflows (null if
    // the budget covers the whole input); _rem = budget left for it
    val bounds = cum.agg(
      max(when(col("_cum") > budget, col("score"))).as("_sstar"),
      (lit(budget) -
        coalesce(max(when(col("_cum") <= budget, col("_cum"))), lit(0L)))
        .as("_rem"))
    val withBounds = s.crossJoin(broadcast(bounds))
    val fullKeep = withBounds
      .filter(col("_sstar").isNull || col("score") > col("_sstar"))
      .select(col(idCol), col("score"), col("cost"))
    val boundary = withBounds.filter(col("score") === col("_sstar"))
      .withColumn("_d6", round(Sampling.hashDraw(col(idCol), salt), 6))
    val bhist = boundary.groupBy(col("_d6"))
      .agg(sum(col("cost")).as("_bc"))
      .withColumn("_bcum", sum(col("_bc")).over(Window.orderBy(col("_d6"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val keptBuckets = bhist.crossJoin(broadcast(bounds))
      .filter(col("_bcum") <= col("_rem"))
      .select(col("_d6"))
    val boundaryKeep = boundary.join(broadcast(keptBuckets), Seq("_d6"))
      .select(col(idCol), col("score"), col("cost"))
    fullKeep.unionByName(boundaryKeep)
  }

  /** Diversity-preserving downsample: bucket every document by the low
    * `bits` bits of its 60-bit SimHash (near-duplicates and same-topic
    * boilerplate share buckets) and keep at most `perBucket` documents
    * per bucket, chosen by content-hash draw — so the kept corpus
    * covers content space at a bounded per-region rate instead of
    * inheriting the crawl's topic skew.
    *
    * Output: `(bucket, rank, doc_id, draw)` — rank 1..≤perBucket in
    * draw order (md5-keyed, partitioning-independent).
    *
    * Scale: the SimHash is one narrow corpus pass (token hash votes,
    * map-side aggregated); the per-bucket cap is the native bounded
    * top-k aggregation ([[TopKAgg.perGroup]]) — ≤ perBucket rows per
    * mapper·bucket before any exchange, never a per-row window sort.
    *
    * `idCol` must be integral (the bounded top-k buffer carries ids as
    * longs; [[TopKAgg.perGroup]] fails fast otherwise).
    */
  def diversitySample(docs: DataFrame, idCol: String, textCol: String,
                      bits: Int = 6, perBucket: Int = 10,
                      salt: String = "div"): DataFrame = {
    val sh = Dedup.simHash(docs, idCol, textCol)
    val scored = sh
      .withColumn("bucket", col("simhash").bitwiseAND((1L << bits) - 1))
      .withColumn("_nscore", -Sampling.hashDraw(col(idCol), salt))
    TopKAgg.perGroup(scored, "bucket", "_nscore", idCol, perBucket)
      .select(col("bucket"), col("rank"), col(idCol),
        (-col("_nscore")).as("draw"))
  }
}
