package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the RAG-serving data-prep face: a sparse
  * lexical run (BM25 over the X78 inverted-index economics) and a
  * dense embedding run ([[Similarity.embedCosineTopK]] exact, or the
  * IVF/PQ indexes at scale) each produce per-query ranked lists;
  * reciprocal-rank fusion combines them with NO score calibration —
  * ranks, not scores, cross the retriever boundary, which is exactly
  * why RRF is the production default for heterogeneous retrievers
  * (lexical scores and cosines live on incomparable scales). On top
  * of the lexical run sits pseudo-relevance feedback (Rocchio-style
  * query expansion): the classic one-round relevance loop that needs
  * no model and no labels.
  *
  * Every face is engine-independent by the repo's standing
  * discipline: BM25 per-term contributions are integerized on the
  * q137 rounding grid BEFORE the cross-term sum (order-free integer
  * aggregation), expansion-term weights are exact integer `tf ·
  * idf_micro` sums, interpolation is integer percent arithmetic, and
  * RRF contributions are pure integer floor divisions — no float
  * ever crosses an aggregation boundary.
  *
  * The corpus-level index frames (term frequencies, document
  * lengths, document frequencies) are derived inline so each
  * operator is self-contained; a production deployment precomputes
  * them once (the X78 inverted-index build) and every shape below
  * consumes them unchanged.
  */
object Retrieval {

  private def dlOf(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).as("dl"))

  private def tfOf(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))

  private def termsOf(queries: DataFrame, qIdCol: String,
                      qTextCol: String): DataFrame =
    queries.select(col(qIdCol).as("query_id"),
        explode(split(col(qTextCol), " ")).as("term"))
      .filter(col("term") =!= "").distinct()

  /** Per-(query, document) integer BM25 score over a `(query_id,
    * term)` term set — the shared scoring core of [[bm25TopK]] and
    * [[prfRerank]]'s two passes: the q137 expression (k1 = 1.2,
    * b = 0.75) per surviving (term, doc) pair, rounded to an INTEGER
    * at 1e-4 units BEFORE the cross-term sum, so the result is an
    * order-free integer aggregation.
    *
    * Scale shape: the term-set df table (vocabulary ⨝ broadcast
    * query terms, then the `df · dfCeilingShare ≤ n_docs` stopword
    * ceiling) broadcasts into ONE posting scan — fan-out is Σ df
    * over surviving terms, never the corpus — and doc length
    * attaches to the bounded candidate set via a SHUFFLE_HASH join
    * against the narrow 16 B/doc `dl` frame.
    *
    * Takes prebuilt index frames `tf(term, doc_id, tf)` /
    * `dl(doc_id, dl)` — the serve face of [[searchLexIndex]], the
    * seam a production deployment feeds its X78 inverted index
    * through, and (round-14) the share point for [[indexOf]]'s
    * once-per-invocation build.
    */
  private def scoreTermsFrom(tf: DataFrame, dl: DataFrame,
                             queryTerms: DataFrame,
                             dfCeilingShare: Int): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qsel = dfreq.join(broadcast(queryTerms), Seq("term"))
      .crossJoin(broadcast(stats))
      .filter(col("df") * lit(dfCeilingShare.toLong) <= col("n_docs"))
      .select(col("term"), col("query_id"), col("df"),
        col("n_docs"), col("avgdl"))
    tf.join(broadcast(qsel), Seq("term"))
      .join(dl.hint("shuffle_hash"), Seq("doc_id"))
      .select(col("query_id"), col("doc_id"),
        round(
          (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
            (col("tf") * 2.2) /
            (col("tf") + lit(1.2) *
              (lit(0.25) + (lit(0.75) * col("dl")) / col("avgdl"))))
          * lit(10000.0), 0).cast("long").as("_c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_c")).as("score_micro"))
  }

  /** Query-likelihood BM25 top-k — score every document against each
    * query's distinct terms and keep the `k` best per query:
    * `(query_id, rank, doc_id, score_micro)`. Scoring/scale contract
    * in [[scoreTerms]]; the per-query cut is the bounded top-k
    * aggregation ([[graft.operators.TopKAgg.perGroup]]), ≤ k rows
    * per (mapper, query) before any exchange — never a corpus-wide
    * window sort.
    */
  /** The operator-local index build: `tf`/`dl` materialized ONCE per
    * invocation (round-14 optimization). Every lazy reference to
    * `tfOf`/`dlOf` re-ran the corpus explode + keyed aggregation —
    * [[prfRerank]] paid FOUR inverted-index builds and five
    * doc-length passes per call (two scoreTerms passes, the expansion
    * weights, and the stats/join double-reads inside each). One
    * checkpointed build is what the X78 production index does; at
    * 100 TB the difference is four corpus-scale shuffles vs one.
    */
  private def indexOf(docs: DataFrame, idCol: String,
                      textCol: String): (DataFrame, DataFrame) =
    (tfOf(docs, idCol, textCol).localCheckpoint(),
      dlOf(docs, idCol, textCol).localCheckpoint())

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int = 10, dfCeilingShare: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(dfCeilingShare >= 1,
      s"dfCeilingShare must be >= 1, got $dfCeilingShare")
    val (tf, dl) = indexOf(docs, idCol, textCol)
    val scored = scoreTermsFrom(tf, dl,
      termsOf(queries, qIdCol, qTextCol), dfCeilingShare)
    graft.operators.TopKAgg
      .perGroup(scored, "query_id", "score_micro", "doc_id", k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro").cast("long").as("score_micro"))
  }

  // ───────────── persisted lexical index (X152) ─────────────

  /** Build the persisted lexical index — the train-once/serve-many
    * face of BM25, the lexical twin of
    * [[Similarity.buildIvfIndex]]:
    * `path/postings` holds `(term, doc_id, tf, ver)` and
    * `path/doclen` holds `(doc_id, dl, ver)`, both APPEND-ONLY —
    * [[appendToLexIndex]] ingests new or re-ingested documents as a
    * new version and serve-time resolution is latest-wins per
    * doc_id. Postings are written sorted by term so each file covers
    * a term range and a serve-time posting probe prunes files.
    */
  def buildLexIndex(docs: DataFrame, idCol: String, textCol: String,
                    path: String): Unit = {
    tfOf(docs, idCol, textCol).withColumn("ver", lit(0L))
      .sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$path/postings")
    dlOf(docs, idCol, textCol).withColumn("ver", lit(0L))
      .write.mode("overwrite").parquet(s"$path/doclen")
  }

  /** Ingest a batch into a stored lexical index WITHOUT rebuilding:
    * each batch gets the next version number, and a doc_id already in
    * the index is REPLACED at serve time (its old version's postings
    * — including terms the new text no longer contains — stop
    * matching, because resolution keeps only rows at the doc's
    * LATEST version). O(batch) work: two batch-derived frames
    * appended; the store is never rewritten.
    */
  def appendToLexIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, batch: DataFrame, idCol: String,
                       textCol: String): Unit =
    // single-writer contract (same as the IVF append family): the
    // next version is max(stored)+1, so concurrent appenders would
    // mint the same version and their doc_id overlaps would collide
    // non-deterministically at resolution. Serialize ingests.
    appendToLexIndex(spark, path, batch, idCol, textCol,
      currentLexVersion(spark, path) + 1L)

  /** The stored index's current max version — the value the no-`ver`
    * [[appendToLexIndex]] reads per call. A serialized multi-batch
    * ingester ([[graft.streaming.LexIndexStream]]) reads it ONCE and
    * mints `base+1, base+2, …` itself (round-14: the per-batch
    * max-scan re-read every doclen file of a GROWING store — O(waves²)
    * file reads over an ingest run — for a value the single-writer
    * contract already determines).
    */
  def currentLexVersion(spark: org.apache.spark.sql.SparkSession,
                        path: String): Long =
    spark.read.parquet(s"$path/doclen")
      .agg(max(col("ver"))).head().getLong(0)

  /** [[appendToLexIndex]] at an EXPLICIT version — the caller owns the
    * single-writer contract (`ver` must exceed every stored version;
    * a non-empty batch always appends ≥1 doclen row, so consecutive
    * integers from [[currentLexVersion]]+1 are always valid).
    */
  def appendToLexIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, batch: DataFrame, idCol: String,
                       textCol: String, ver: Long): Unit = {
    tfOf(batch, idCol, textCol).withColumn("ver", lit(ver))
      .sortWithinPartitions(col("term"))
      .write.mode("append").parquet(s"$path/postings")
    dlOf(batch, idCol, textCol).withColumn("ver", lit(ver))
      .write.mode("append").parquet(s"$path/doclen")
  }

  /** The stored index resolved to its CURRENT state: latest-wins per
    * doc_id. `dl` resolves via the X34 max-struct aggregation (one
    * row per (doc, ver), no window); postings join the narrow
    * per-doc max-version frame SHUFFLE_HASH on doc_id — a stale
    * version's rows (and with them any term the re-ingested text
    * dropped) vanish here.
    */
  private def lexCurrent(spark: org.apache.spark.sql.SparkSession,
                         path: String): (DataFrame, DataFrame) = {
    val dlAll = spark.read.parquet(s"$path/doclen")
    val dmax = dlAll.groupBy(col("doc_id"))
      .agg(max(col("ver")).as("_mv"))
    val dlCur = dlAll.groupBy(col("doc_id"))
      .agg(max(struct(col("ver"), col("dl"))).as("_s"))
      .select(col("doc_id"), col("_s.dl").as("dl"))
    val tfCur = spark.read.parquet(s"$path/postings")
      .join(dmax.hint("shuffle_hash"), Seq("doc_id"))
      .filter(col("ver") === col("_mv"))
      .select(col("term"), col("doc_id"), col("tf"))
    (tfCur, dlCur)
  }

  /** BM25 top-k served from the PERSISTED index — identical output
    * contract to [[bm25TopK]] over the index's current (latest-wins)
    * corpus state, with no corpus scan: `(query_id, rank, doc_id,
    * score_micro)`.
    */
  def searchLexIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String, queries: DataFrame, qIdCol: String,
                     qTextCol: String, k: Int = 10,
                     dfCeilingShare: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(dfCeilingShare >= 1,
      s"dfCeilingShare must be >= 1, got $dfCeilingShare")
    val (tfCur, dlCur) = lexCurrent(spark, path)
    val scored = scoreTermsFrom(tfCur, dlCur,
      termsOf(queries, qIdCol, qTextCol), dfCeilingShare)
    graft.operators.TopKAgg
      .perGroup(scored, "query_id", "score_micro", "doc_id", k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro").cast("long").as("score_micro"))
  }

  /** Pseudo-relevance-feedback expansion terms (Rocchio 1971, the
    * label-free one-round relevance loop): take each query's
    * `kFeedback` best BM25 documents AS IF relevant, weight every
    * term they contain by the exact integer `Σ tf · idf_micro`
    * (`idf_micro = round(idf · 1e6)`, the q137 idf), drop the
    * original query terms (they are already in the query) and
    * ceiling-blocked stopwords (a term carried by 1/dfCeilingShare
    * of the corpus cannot sharpen a query), and keep the `mExpand`
    * strongest per query by (weight desc, term):
    * `(query_id, trank, term, w_micro)`.
    *
    * Scale: the feedback set is kFeedback docs per query (broadcast
    * into the posting scan — the expansion candidate pool is those
    * docs' term lists, never the vocabulary), and the per-query rank
    * windows over that bounded pool (≤ kFeedback · doc-length terms).
    */
  def prfExpandTerms(docs: DataFrame, idCol: String, textCol: String,
                     queries: DataFrame, qIdCol: String,
                     qTextCol: String, kFeedback: Int = 5,
                     mExpand: Int = 10,
                     dfCeilingShare: Int = 10): DataFrame = {
    require(kFeedback >= 1, s"kFeedback must be >= 1, got $kFeedback")
    require(mExpand >= 1, s"mExpand must be >= 1, got $mExpand")
    require(dfCeilingShare >= 1,
      s"dfCeilingShare must be >= 1, got $dfCeilingShare")
    val (tf, dl) = indexOf(docs, idCol, textCol)
    prfExpandTermsFrom(tf, dl, queries, qIdCol, qTextCol, kFeedback,
      mExpand, dfCeilingShare)
  }

  /** [[prfExpandTerms]] over prebuilt `tf`/`dl` index frames (the
    * [[scoreTermsFrom]] seam) — lets [[prfRerank]] share ONE index
    * build across its passes.
    */
  private def prfExpandTermsFrom(tf: DataFrame, dl: DataFrame,
                                 queries: DataFrame, qIdCol: String,
                                 qTextCol: String, kFeedback: Int,
                                 mExpand: Int,
                                 dfCeilingShare: Int): DataFrame = {
    val qterms = termsOf(queries, qIdCol, qTextCol)
    val scores = scoreTermsFrom(tf, dl, qterms, dfCeilingShare)
    val fb = graft.operators.TopKAgg
      .perGroup(scores, "query_id", "score_micro", "doc_id", kFeedback)
      .select(col("query_id"), col("doc_id"))
    val nDocs = dl
      .agg(count(lit(1)).as("n_docs"))
    val idfm = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * lit(dfCeilingShare.toLong) <= col("n_docs"))
      .select(col("term"),
        round(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1)
          * lit(1000000.0), 0).cast("long").as("idf_micro"))
    tf.join(broadcast(fb), Seq("doc_id"))
      .join(idfm.hint("shuffle_hash"), Seq("term"))
      .join(broadcast(qterms), Seq("query_id", "term"), "left_anti")
      .groupBy(col("query_id"), col("term"))
      .agg(sum(col("tf") * col("idf_micro")).as("w_micro"))
      .withColumn("trank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("w_micro").desc, col("term"))).cast("int"))
      .filter(col("trank") <= mExpand)
      .select(col("query_id"), col("trank"), col("term"),
        col("w_micro"))
  }

  /** PRF-expanded reranking: the original BM25 scores interpolated
    * with a second scoring pass over the [[prfExpandTerms]] terms —
    * `final = origPct·orig + (100−origPct)·exp` in pure integer
    * percent arithmetic, top-k per query by (final desc, doc_id):
    * `(query_id, rank, doc_id, final_micro)`. A document matching
    * only expansion terms can now be retrieved (the vocabulary-gap
    * case PRF exists for); one matching only original terms keeps
    * `origPct` of its score.
    *
    * Scale: two [[scoreTerms]] passes (both posting-bounded) and one
    * full-outer join of the two bounded candidate sets on
    * (query_id, doc_id).
    */
  def prfRerank(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, qIdCol: String, qTextCol: String,
                kFeedback: Int = 5, mExpand: Int = 10,
                origPct: Int = 60, k: Int = 10,
                dfCeilingShare: Int = 10): DataFrame = {
    require(origPct >= 0 && origPct <= 100,
      s"origPct must be in [0, 100], got $origPct")
    require(k >= 1, s"k must be >= 1, got $k")
    // ONE index build shared by all three passes (see [[indexOf]])
    val (tf, dl) = indexOf(docs, idCol, textCol)
    val orig = scoreTermsFrom(tf, dl,
        termsOf(queries, qIdCol, qTextCol), dfCeilingShare)
      .withColumnRenamed("score_micro", "orig_micro")
    val exp = prfExpandTermsFrom(tf, dl, queries, qIdCol,
      qTextCol, kFeedback, mExpand, dfCeilingShare)
    val eScores = scoreTermsFrom(tf, dl,
        exp.select(col("query_id"), col("term")), dfCeilingShare)
      .withColumnRenamed("score_micro", "exp_micro")
    val comb = orig.join(eScores, Seq("query_id", "doc_id"),
        "full_outer")
      .select(col("query_id"), col("doc_id"),
        (lit(origPct.toLong) * coalesce(col("orig_micro"), lit(0L)) +
          lit((100L - origPct)) * coalesce(col("exp_micro"), lit(0L)))
          .as("final_micro"))
    graft.operators.TopKAgg
      .perGroup(comb, "query_id", "final_micro", "doc_id", k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("final_micro").cast("long").as("final_micro"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * `score(q, d) = Σ_runs 1/(k0 + rank_run(q, d))` with the
    * published default k0 = 60. Each input frame is one retriever's
    * ranked output `(query_id, doc_id, rank)` (1-based; a document
    * absent from a run simply contributes nothing — the published
    * formula). Output: `(query_id, rank, doc_id, rrf_micro)`, the
    * `topK` best per query by (fused score desc, doc_id).
    *
    * Contributions are integerized as `10^12 DIV (k0 + rank)` — pure
    * integer floor division, so the fused score is an order-free
    * integer sum with NO floats anywhere; consecutive ranks stay
    * distinguishable on the 10^12 grid far past any top-k in use
    * (the gap at rank r is ~10^12/(k0+r)^2 ≥ 1 until r ~ 10^6).
    *
    * Scale: inputs are top-k-bounded per retriever, so the union +
    * keyed integer sum shuffles ≤ Σ_runs k_run rows per query, and
    * the cut is the bounded top-k aggregation — the fusion itself can
    * never become the bottleneck regardless of corpus size.
    */
  def rrfFuse(runs: Seq[DataFrame], k0: Int = 60,
              topK: Int = 10): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one ranked run")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    val contribs = runs.map(_.select(col("query_id"), col("doc_id"),
      expr(s"CAST(1000000000000 DIV (CAST($k0 AS BIGINT) + " +
        "CAST(rank AS BIGINT)) AS BIGINT)").as("_c")))
    val fused = contribs.reduce(_.unionByName(_))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_c")).as("rrf_micro"))
    graft.operators.TopKAgg
      .perGroup(fused, "query_id", "rrf_micro", "doc_id", topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_micro").cast("long").as("rrf_micro"))
  }
}
