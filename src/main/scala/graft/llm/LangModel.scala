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
    */
  def bigramStream(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w1")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks.withColumn("w2", lead(col("w1"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("w1"), col("w2")).as("bigram"))
  }

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
    // c(w1·) = transitions starting at w1 — derived from the same
    // stream so the two counts are consistent by construction
    val c1 = bg
      .select(substring_index(col("bigram"), " ", 1).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    bg.join(c2, "bigram")
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(c1, "w1")
      .select(col("doc_id"),
        round(log(col("n1").cast("double") / col("n2")), 6)
          .cast(DecimalType(18, 6)).as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 4).as("avg_nll"))
      .withColumn("ppl", round(exp(col("avg_nll")), 3))
  }

  /** Top-`k` corpus vocabulary by token frequency (ties broken on the
    * term so the cut is deterministic): `(term, n)`.
    */
  def vocabulary(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(k)

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
