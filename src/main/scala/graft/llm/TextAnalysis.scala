package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for LLM training-data pipelines: per-document stats,
  * quality scoring, token counting, normalization fingerprints, and a
  * marker-based language-ID heuristic. Everything is a narrow
  * projection of codegen'd string/array expressions — the whole stage
  * fuses into the document scan; at 100 TB this runs at I/O speed with
  * zero shuffles.
  */
object TextAnalysis {

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "in", "to", "is")

  private def toks(textCol: String) = split(col(textCol), " ")

  /** Count of tokens belonging to a fixed marker set — the codegen'd
    * [[graft.functions.TokenSetCount]] (the `size(filter(t -> t IN …))`
    * HOF form it replaces ran interpreted per token; see the
    * expression's scaladoc for the parity contract).
    */
  private def markerCount(toksCol: String, set: Seq[String]): Column =
    graft.functions.TextExprs.tokenSetCount(col(toksCol), set)

  /** Per-document statistics: char/token/unique-token counts, average
    * token length, stopword ratio, punctuation and digit ratios.
    */
  def textStats(docs: DataFrame, idCol: String, textCol: String,
                stopwords: Seq[String] = defaultStopwords): DataFrame =
    docs
      .withColumn("_toks", toks(textCol))
      .select(
        col(idCol),
        length(col(textCol)).as("n_chars"),
        size(col("_toks")).as("n_tokens"),
        size(array_distinct(col("_toks"))).as("n_unique"),
        // Σ token lengths == non-space char count (split-on-' ' tokens
        // partition exactly the non-space chars; empty tokens from
        // doubled/edge spaces contribute 0) — `translate` is codegen'd
        // where the previous aggregate-over-transform HOF ran an
        // interpreted per-token fold; values are bit-identical
        round(length(translate(col(textCol), " ", ""))
          .cast("double") / size(col("_toks")), 6).as("avg_token_len"),
        round(markerCount("_toks", stopwords).cast("double") / size(col("_toks")), 6)
          .as("stop_ratio"),
        round((length(col(textCol)) -
          length(regexp_replace(col(textCol), "[.,!?;:'\"]", ""))).cast("double") /
          length(col(textCol)), 6).as("punct_ratio"),
        round((length(col(textCol)) -
          length(regexp_replace(col(textCol), "[0-9]", ""))).cast("double") /
          length(col(textCol)), 6).as("digit_ratio"))

  /** Composite quality score in [0,1]: length saturation, stopword
    * presence, lexical diversity — the usual cheap pre-filter stack a
    * training pipeline applies before expensive model-based scoring.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String] = defaultStopwords): DataFrame =
    textStats(docs, idCol, textCol, stopwords)
      .select(col(idCol),
        round((
          least(col("n_chars").cast("double") / 500.0, lit(1.0)) +
          least(col("stop_ratio") * 5.0, lit(1.0)) +
          col("n_unique").cast("double") / col("n_tokens")) / 3.0, 6)
          .as("quality"))

  /** Token counting: regex word tokens plus the chars/4 subword
    * estimate (the standard BPE-budget heuristic when the real
    * tokenizer is out of reach).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(expr(s"regexp_extract_all($textCol, '[a-z]+|[0-9]+', 0)"))
        .as("n_word_tokens"),
      ceil(length(col(textCol)).cast("double") / 4.0).cast("int")
        .as("n_subword_est"))

  /** Normalization fingerprint: md5 over lowercased,
    * whitespace-collapsed text — the cheap exact-dup key that survives
    * formatting noise.
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      md5(lower(regexp_replace(col(textCol), "\\s+", " "))).as("fingerprint"))

  /** PII scrubbing: count and replace email/phone patterns (the
    * redaction pass a corpus takes before training). Pure codegen'd
    * regexp functions — RE2-compatible patterns so external engines
    * (and the DuckDB oracle) replay them byte-identically.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Production-style PRETOKENIZATION (the simplified GPT-2 shape):
    * rewrite text so that letter runs, digit runs, and punctuation
    * runs are separated by single spaces — the word stream a real
    * tokenizer trains on ("don't" → `don ' t`, "x2!" → `x 2 !`),
    * instead of raw whitespace words that glue punctuation onto word
    * types and explode the vocabulary. Output composes DIRECTLY with
    * the whole BPE stack (train/encode/ids/pack), which splits on
    * single spaces. Pure codegen'd regexp passes, RE2-compatible and
    * group-free in semantics, so an external engine replays them
    * byte-identically. The `<`/`>` sentinels become their own
    * punctuation tokens and stay excluded by the BPE word guard (the
    * documented unrepresentable-sentinel contract). Simplification vs
    * GPT-2 proper: no contraction-suffix rules, no Unicode category
    * classes — ASCII letter/digit/punct runs.
    */
  def preTokenize(c: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
      "[A-Za-z]+", " $0 "), "[0-9]+", " $0 "), "[^A-Za-z0-9 ]+", " $0 "),
      " +", " "))

  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).as("n_phones"),
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("redacted"))

  /** TF-IDF top-k terms per document: tf = in-doc term count,
    * idf = ln(N / df) over the corpus, rank by (tfidf desc, term asc).
    * Integer tf/df/N keep everything exact up to the single ln() —
    * identical-formula evaluation per term makes the ranking stable
    * across engines (exact ties are broken by the term).
    * Two shuffles (doc-term, term) + the per-doc window; the corpus
    * size joins in as a 1-row broadcast, never a driver round-trip.
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    val tok = docs.select(col(idCol), explode(toks(textCol)).as("term"))
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("tfidf"), col("rank"))
  }

  /** Marker-token language ID: score = |tokens ∩ markers(lang)|,
    * predicted = first language (in `profiles` order) achieving the
    * max score. A real pipeline feeds char-n-gram profiles here; the
    * operator is the scoring/argmax machinery, which is profile-
    * agnostic.
    */
  def languageId(docs: DataFrame, idCol: String, textCol: String,
                 profiles: Seq[(String, Seq[String])]): DataFrame = {
    val withToks = docs.withColumn("_toks", toks(textCol))
    val scored = profiles.foldLeft(withToks) { case (df, (lang, markers)) =>
      df.withColumn(s"_s_$lang", markerCount("_toks", markers))
    }
    val scoreCols = profiles.map { case (lang, _) => col(s"_s_$lang") }
    val best = greatest(scoreCols: _*)
    // first profile in list wins ties: outermost WHEN checks it first
    val firstWins = profiles.foldRight(lit("und")) { case ((lang, _), elseCol) =>
      when(col(s"_s_$lang") === best, lang).otherwise(elseCol)
    }
    scored.select(col(idCol), firstWins.as("predicted_lang"),
      best.cast("int").as("score"))
  }

  /** Repeated-n-gram ratio — the repetition quality signal (à la
    * Gopher/RefinedWeb rules): fraction of n-gram OCCURRENCES that are
    * duplicates of an earlier one, `1 − distinct/total`. Degenerate
    * generated text scores high; clean prose near zero. Narrow
    * shuffle-free projection, fused into the scan.
    */
  def repetitionRatio(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    docs
      .withColumn("_toks", toks(textCol))
      .withColumn("_grams",
        graft.functions.TextExprs.wordNgrams(col("_toks"), n))
      .select(col(idCol),
        size(col("_grams")).as("n_grams"),
        round(when(size(col("_grams")) > 0,
          lit(1.0) - size(array_distinct(col("_grams"))).cast("double") /
            size(col("_grams"))).otherwise(0.0), 6).as("rep_ratio"))
  }

  /** Token-distribution Shannon entropy per document — the gibberish /
    * keyword-stuffing detector (uniform noise maxes entropy for its
    * length; a single token repeated gives 0). Computed engine-stably:
    * entropy = ln(N) − Σ c·ln(c) / N over token counts c; each
    * c·ln(c) term is rounded to 9 decimals and summed as EXACT decimal
    * (a double Σ would depend on partition visit order), then the
    * closed form is applied once. Two narrow aggregations keyed by
    * (doc, token) then doc.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(toks(textCol)).as("_t"))
      .groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("_n"),
        sum(round(col("_c") * log(col("_c")), 9).cast("decimal(18,9)"))
          .as("_s"))
      .select(col(idCol),
        col("_n").cast("int").as("n_tokens"),
        round(log(col("_n")) - col("_s").cast("double") / col("_n"), 6)
          .as("entropy"))

  /** ONE-PASS quality signal panel: every per-row curation signal —
    * [[textStats]], [[qualityScore]], [[languageId]], and
    * [[repetitionRatio]] — in a single narrow projection over a single
    * corpus scan. Composing the four operators costs four corpus scans
    * plus three doc-keyed joins (three corpus shuffles); a real
    * curation pipeline scores everything at ingest, where the panel
    * shape is zero shuffles and zero joins. Values are bit-identical
    * to the standalone operators (same expressions, same rounding),
    * so any downstream filter behaves identically.
    *
    * Per-(doc, token)-aggregation signals ([[tokenEntropy]]) stay
    * standalone — they need a shuffle by construction.
    *
    * Output: `(idCol, n_chars, n_tokens, n_unique, avg_token_len,
    * stop_ratio, punct_ratio, digit_ratio, quality, predicted_lang,
    * lang_score, n_grams, rep_ratio)`.
    */
  def signalPanel(docs: DataFrame, idCol: String, textCol: String,
                  profiles: Seq[(String, Seq[String])],
                  stopwords: Seq[String] = defaultStopwords,
                  repN: Int = 3): DataFrame = {
    val base = docs.withColumn("_toks", toks(textCol))
    val scored = profiles.foldLeft(base) { case (df, (lang, markers)) =>
      df.withColumn(s"_s_$lang", markerCount("_toks", markers))
    }
    val stats = scored.select(
      Seq(col(idCol),
        length(col(textCol)).as("n_chars"),
        size(col("_toks")).as("n_tokens"),
        size(array_distinct(col("_toks"))).as("n_unique"),
        round(length(translate(col(textCol), " ", ""))
          .cast("double") / size(col("_toks")), 6).as("avg_token_len"),
        round(markerCount("_toks", stopwords).cast("double") /
          size(col("_toks")), 6).as("stop_ratio"),
        round((length(col(textCol)) -
          length(regexp_replace(col(textCol), "[.,!?;:'\"]", ""))).cast("double") /
          length(col(textCol)), 6).as("punct_ratio"),
        round((length(col(textCol)) -
          length(regexp_replace(col(textCol), "[0-9]", ""))).cast("double") /
          length(col(textCol)), 6).as("digit_ratio"),
        graft.functions.TextExprs.wordNgrams(col("_toks"), repN).as("_grams")) ++
        profiles.map { case (lang, _) => col(s"_s_$lang") }: _*)
    val best = greatest(profiles.map { case (lang, _) => col(s"_s_$lang") }: _*)
    val firstWins = profiles.foldRight(lit("und")) { case ((lang, _), e) =>
      when(col(s"_s_$lang") === best, lang).otherwise(e)
    }
    stats.select(col(idCol),
      col("n_chars"), col("n_tokens"), col("n_unique"),
      col("avg_token_len"), col("stop_ratio"), col("punct_ratio"),
      col("digit_ratio"),
      round((
        least(col("n_chars").cast("double") / 500.0, lit(1.0)) +
        least(col("stop_ratio") * 5.0, lit(1.0)) +
        col("n_unique").cast("double") / col("n_tokens")) / 3.0, 6)
        .as("quality"),
      firstWins.as("predicted_lang"),
      best.cast("int").as("lang_score"),
      size(col("_grams")).as("n_grams"),
      round(when(size(col("_grams")) > 0,
        lit(1.0) - size(array_distinct(col("_grams"))).cast("double") /
          size(col("_grams"))).otherwise(0.0), 6).as("rep_ratio"))
  }

  /** [[languageId]] + [[qualityScore]] as two extra columns ON the
    * input rows — the fused filter face of the curation funnel
    * (round-14 optimization): `processBatch` previously ran
    * languageId and qualityScore as two separate corpus scans whose
    * id sets were semi-joined back onto the batch (two extra text
    * passes + two batch-scale join shuffles per micro-batch). The
    * signals are per-row narrow projections, so they can ride the
    * batch rows directly: one scan, zero joins. Values are
    * bit-identical to the standalone operators (same expressions,
    * same `round(…, 6)` points — the [[signalPanel]] parity
    * argument), so every downstream filter keeps its exact row set.
    */
  private[graft] def langQualityOn(docs: DataFrame, textCol: String,
      profiles: Seq[(String, Seq[String])],
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val scored = profiles.foldLeft(docs.withColumn("_toks", toks(textCol))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"_s_$lang", markerCount("_toks", markers))
    }
    val best = greatest(profiles.map { case (l, _) => col(s"_s_$l") }: _*)
    val firstWins = profiles.foldRight(lit("und")) { case ((l, _), e) =>
      when(col(s"_s_$l") === best, l).otherwise(e)
    }
    val stopRatio = round(markerCount("_toks", stopwords).cast("double") /
      size(col("_toks")), 6)
    scored
      .withColumn("predicted_lang", firstWins)
      .withColumn("quality", round((
        least(length(col(textCol)).cast("double") / 500.0, lit(1.0)) +
        least(stopRatio * 5.0, lit(1.0)) +
        size(array_distinct(col("_toks"))).cast("double") /
          size(col("_toks"))) / 3.0, 6))
      .drop(Seq("_toks") ++ profiles.map { case (l, _) => s"_s_$l" }: _*)
  }

  /** Corpus-level top-k word bigrams — the boilerplate / template
    * detector: a bigram whose count approaches the document count is
    * repeated scaffolding, not content. Bigram generation is a narrow
    * per-row array transform fused into the scan; the count is one
    * partial-aggregated shuffle keyed by bigram, and the top-k is a
    * `TakeOrderedAndProject` (no global sort materializes). Ties are
    * fully broken by (count desc, bigram asc) so the row set is
    * deterministic across engines.
    */
  def topBigrams(docs: DataFrame, textCol: String, k: Int = 50): DataFrame =
    docs
      .withColumn("_toks", toks(textCol))
      .select(explode(graft.functions.TextExprs.wordNgrams(col("_toks"), 2))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)
}
