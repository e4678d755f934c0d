package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical language-model signals for corpus curation.
  *
  * A bigram model trained on the corpus itself is the classic cheap
  * "perplexity" filter for training data: documents whose token
  * transitions are rare under the corpus distribution (boilerplate
  * mixes, scrambled text, wrong-language fragments) score a high
  * average negative log-likelihood and can be dropped or
  * down-weighted before training. The vocabulary/OOV statistics are
  * the companion signal: a document whose tokens fall mostly outside
  * the top-K corpus vocabulary is noise for a fixed-vocab tokenizer.
  *
  * Scale design: everything is token-stream relational algebra —
  * explode, two hash aggregations (bigram counts, unigram counts),
  * and equi-joins back onto the token stream keyed on the bigram /
  * first token. No per-document collection, no driver state; the
  * vocabulary is a top-K via `TakeOrderedAndProject` and rides a
  * broadcast join. Count tables grow with the VOCABULARY (sublinear
  * in corpus size), not with the corpus.
  *
  * Determinism: `LN` of identical doubles, rounded per-bigram to 6
  * digits, summed exactly in decimal (partition-order independent),
  * averaged with one double division — the [[graft.functions.Det]]
  * discipline, so an external engine replaying the formula matches
  * bit-for-bit.
  */
object LangModel {

  /** Per-document bigram stream `(doc_id, bigram)` where bigram is
    * the space-joined token pair. Documents with fewer than two
    * tokens emit nothing (they have no transitions to score).
    *
    * Generated as a narrow per-row array transform fused into the
    * scan — the original posexplode + per-doc `lead` window paid a
    * corpus-sized shuffle AND a per-document sort just to pair
    * adjacent tokens, which the array form gets for free (the sf1
    * profile of q143 charged ~9 s of its CPU to that window stage).
    */
  def bigramStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks"))
      .select(col("doc_id"),
        explode(graft.functions.TextExprs.wordNgrams(col("_toks"), 2))
          .as("bigram"))

  /** Per-document average bigram negative log-likelihood under the
    * corpus's own (unsmoothed) bigram model:
    * `nll(w1 w2) = ln(c(w1·) / c(w1 w2))`, averaged over the
    * document's transitions, plus `ppl = exp(avg)`. Training on the
    * scored corpus itself means every bigram has count ≥ 1 — no
    * smoothing term to pick. Output: `(doc_id, n_bigrams, avg_nll,
    * ppl)`.
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = bigramStream(docs, idCol, textCol)
    val c2 = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n2"))
    // c(w1·) = Σ_w2 c(w1 w2): derived from the VOCABULARY-sized c2
    // (identical counts to re-aggregating the stream), and the whole
    // per-bigram score assembled vocabulary-side so the corpus stream
    // shuffles ONCE for the score join instead of twice — the sf1
    // profile charged ~90 CPU-s to the second corpus-stream join
    val c1 = c2.select(substring_index(col("bigram"), " ", 1).as("w1"),
        col("n2"))
      .groupBy(col("w1")).agg(sum(col("n2")).as("n1"))
    val nllTab = c2
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(c1, "w1")
      .select(col("bigram"),
        round(log(col("n1").cast("double") / col("n2")), 6)
          .cast(DecimalType(18, 6)).as("nll"))
    // SHUFFLE_HASH with the vocabulary table as build side: left to
    // itself Spark BROADCASTS THE CORPUS STREAM here — size estimation
    // ignores Generate fan-out, so the exploded bigram side of the join
    // looks like its (small) parquet parent and becomes the build side
    // (the sf1 plan had BroadcastExchange over the 2.7M-row stream,
    // a 5.3 s single-task build; at scale it would OOM the driver).
    // The bigram vocabulary is corpus-sublinear but not driver-bounded,
    // so a broadcast hint on the vocab side would be the same trap one
    // decade later — the shuffle-hash join is the shape that survives.
    bg.join(nllTab.hint("shuffle_hash"), "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 4).as("avg_nll"))
      .withColumn("ppl", round(exp(col("avg_nll")), 3))
  }

  /** CCNet-style reference-perplexity filter: train an add-one-
    * smoothed bigram model on the slice of the corpus selected by
    * `refFilter` (the "known-clean" reference — a trusted source, a
    * hand-curated sample), score EVERY document against it, and
    * bucket each language's documents into perplexity tertiles
    * `head` / `middle` / `tail` — the shape CCNet uses to keep the
    * head, downsample the middle, and drop the tail before training.
    *
    * Unlike [[bigramNll]] (scored corpus == training corpus, so no
    * smoothing is needed), the scored stream here contains bigrams
    * the reference never saw, so the model smooths add-one over the
    * reference vocabulary `V`:
    * `nll(w1 w2) = ln((c(w1·) + V) / (c(w1 w2) + 1))`
    * (unseen context ⇒ uniform `1/V`).
    *
    * Scale design: the count tables are reference-vocabulary-sized
    * (corpus-sublinear) and join the scored bigram stream on the
    * bigram / first-token key; `V` rides a 1-row broadcast. The
    * tertile cutoffs deliberately avoid a global `row_number` (a
    * single-partition sort at 100 TB): they come from a cumulative
    * count over the distinct `(lang, rounded-ppl)` VALUE histogram —
    * thousands of rows regardless of corpus size — and are broadcast
    * back. Ties at a cutoff value share a bucket, so the result is
    * independent of partitioning and replayable by an external
    * engine.
    *
    * Output: `(doc_id, lang, n_bigrams, ppl, bucket)`; documents
    * with fewer than two tokens have no transitions and emit nothing.
    *
    * Contract: the reference slice must be non-empty — with an empty
    * reference V = 0 and the smoothed probability is undefined
    * (`ln(0/1)`), which surfaces as null scores rather than a throw;
    * callers pick `refFilter` so this cannot happen (a perplexity
    * filter without a reference corpus is not a meaningful ask).
    */
  def refPerplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                           langCol: String, refFilter: org.apache.spark.sql.Column): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
      refFilter.as("_ref"), split(col(textCol), " ").as("_toks"))
    val bg = toks.select(col("doc_id"), col("lang"), col("_ref"),
        explode(graft.functions.TextExprs.wordNgrams(col("_toks"), 2))
          .as("bigram"))
    val ref = bg.filter(col("_ref"))
    val c2 = ref.groupBy(col("bigram")).agg(count(lit(1)).as("n2"))
    // c(w1·) = Σ_w2 c(w1 w2): derived from the vocabulary-sized c2
    // instead of re-aggregating the reference bigram stream — one
    // fewer reference-corpus pass, identical counts by construction
    val c1 = c2.select(substring_index(col("bigram"), " ", 1).as("w1"),
        col("n2"))
      .groupBy(col("w1")).agg(sum(col("n2")).as("n1"))
    val vsz = docs.filter(refFilter)
      .select(explode(split(col(textCol), " ")).as("term"))
      .agg(count_distinct(col("term")).as("vsz"))
    val scored = bg
      .join(c2, Seq("bigram"), "left")
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vsz))
      .select(col("doc_id"), col("lang"),
        round(log((coalesce(col("n1"), lit(0L)) + col("vsz")).cast("double") /
          (coalesce(col("n2"), lit(0L)) + lit(1))), 6)
          .cast(DecimalType(18, 6)).as("nll"))
    val d = scored.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(round(sum(col("nll")).cast("double") / count(lit(1)), 4)), 3)
          .as("ppl"))
    // tertile cutoffs off the (lang, ppl) value histogram — never a
    // global per-row rank
    val hist = d.groupBy(col("lang"), col("ppl")).agg(count(lit(1)).as("n"))
    val cum = hist
      .withColumn("cn", sum(col("n")).over(Window.partitionBy(col("lang"))
        .orderBy(col("ppl")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("lang"))))
    val cuts = cum.groupBy(col("lang")).agg(
      min(when(col("cn") * 3 >= col("tot"), col("ppl"))).as("_cut1"),
      min(when(col("cn") * 3 >= col("tot") * 2, col("ppl"))).as("_cut2"))
    d.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("ppl"),
        when(col("ppl") <= col("_cut1"), lit("head"))
          .when(col("ppl") <= col("_cut2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Top-`k` corpus vocabulary by token frequency (ties broken on the
    * term so the cut is deterministic): `(term, n)`.
    */
  def vocabulary(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(k)

  /** Top-`k` collocations by pointwise mutual information:
    * `pmi(w1,w2) = ln(N·c(w1 w2) / (c(w1·)·c(·w2)))` over transitions
    * occurring at least `minCount` times — high-PMI pairs are
    * multi-word expressions ("new york") worth a single tokenizer
    * unit; near-zero pairs co-occur by chance. Same count tables as
    * [[bigramNll]] (vocabulary-sized, corpus-sublinear); the total-N
    * scalar rides a 1-row broadcast cross join. Output:
    * `(bigram, n, pmi)`.
    */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      k: Int, minCount: Int = 5): DataFrame = {
    // one corpus-stream aggregation; totals and both margins derive
    // from the vocabulary-sized bigram-count table (identical values,
    // three fewer corpus passes)
    val c2 = bigramStream(docs, idCol, textCol)
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
    val tot = c2.agg(sum(col("n")).as("n_tr"))
    val c1l = c2.select(substring_index(col("bigram"), " ", 1).as("w1"),
        col("n"))
      .groupBy(col("w1")).agg(sum(col("n")).as("nl"))
    val c1r = c2.select(substring_index(col("bigram"), " ", -1).as("w2"),
        col("n"))
      .groupBy(col("w2")).agg(sum(col("n")).as("nr"))
    c2.filter(col("n") >= minCount)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(c1l, "w1").join(c1r, "w2")
      .crossJoin(broadcast(tot))
      .select(col("bigram"), col("n"),
        round(log(col("n_tr").cast("double") * col("n") /
          (col("nl").cast("double") * col("nr"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram")).limit(k)
  }

  /** Top-`k` label-discriminative terms by chi-squared on the 2×2
    * document-presence contingency (term ∈ doc? × label = L?):
    * `χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))` — the classic
    * supervised feature-selection / domain-signature score. All
    * counts are exact integers off one distinct `(term, doc)` stream;
    * the per-label doc totals are a broadcast dim. Terms must appear
    * in at least `minDocs` documents. Output:
    * `(term, label, chi2)`.
    */
  def chi2Terms(docs: DataFrame, idCol: String, textCol: String,
                labelCol: String, k: Int, minDocs: Int = 5): DataFrame = {
    val td = docs.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("term"))
      .select(col("doc_id"), col("label"), col("term")).distinct()
    val nDocs = docs.agg(count(lit(1)).as("n_all"))
    val labelTot = docs.select(col(labelCol).as("label"))
      .groupBy(col("label")).agg(count(lit(1)).as("n_label"))
    val tl = td.groupBy(col("term"), col("label")).agg(count(lit(1)).as("a"))
    val tTot = tl.groupBy(col("term")).agg(sum(col("a")).as("n_term"))
    tl.join(tTot, "term").filter(col("n_term") >= minDocs)
      .join(broadcast(labelTot), "label")
      .crossJoin(broadcast(nDocs))
      .select(col("term"), col("label"),
        col("a"), (col("n_term") - col("a")).as("b"),
        (col("n_label") - col("a")).as("c"),
        (col("n_all") - col("n_term") - col("n_label") + col("a")).as("d"),
        col("n_all"))
      .select(col("term"), col("label"),
        // a margin of zero (term in every doc / single label) means
        // independence by construction: chi2 = 0, and the closed form
        // would divide 0/0 — guard on the two degenerate margins
        when(col("c") + col("d") === 0 || col("b") + col("d") === 0, lit(0.0))
          .otherwise(round(col("n_all").cast("double") *
            (col("a") * col("d") - col("b") * col("c")) *
            (col("a") * col("d") - col("b") * col("c")) /
            (((col("a") + col("b")) * (col("c") + col("d"))).cast("double") *
              ((col("a") + col("c")) * (col("b") + col("d"))).cast("double")),
            4)).as("chi2"))
      .orderBy(col("chi2").desc, col("term"), col("label")).limit(k)
  }

  /** Per-language out-of-vocabulary statistics against the top-`k`
    * corpus vocabulary: document count, mean per-document OOV rate,
    * and corpus-level token coverage. The vocabulary is broadcast —
    * the token stream never shuffles for the membership test.
    * Output: `(lang, n_docs, avg_oov_rate, token_coverage)`.
    */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
               langCol: String, k: Int): DataFrame = {
    val vocab = vocabulary(docs, textCol, k).select(col("term"))
    val toks = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
      explode(split(col(textCol), " ")).as("term"))
    val perDoc = toks
      .join(broadcast(vocab.withColumn("_in", lit(1))), Seq("term"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("_in").isNull, 1).otherwise(0)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tok"), 4))
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("oov_rate").cast(DecimalType(18, 4))).cast("double") /
          count(lit(1)), 4).as("avg_oov_rate"),
        round(lit(1.0) - sum(col("n_oov")).cast("double") /
          sum(col("n_tok")).cast("double"), 4).as("token_coverage"))
  }
}
