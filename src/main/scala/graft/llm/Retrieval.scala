package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the RAG-serving data-prep face: a sparse
  * lexical run (BM25 over the X78 inverted-index economics) and a
  * dense embedding run ([[Similarity.embedCosineTopK]] exact, or the
  * IVF/PQ indexes at scale) each produce per-query ranked lists;
  * reciprocal-rank fusion combines them with NO score calibration —
  * ranks, not scores, cross the retriever boundary, which is exactly
  * why RRF is the production default for heterogeneous retrievers
  * (lexical scores and cosines live on incomparable scales).
  *
  * Both faces are engine-independent by the repo's standing
  * discipline: BM25 per-term contributions are integerized on the
  * q137 rounding grid BEFORE the cross-term sum (order-free integer
  * aggregation), and RRF contributions are pure integer floor
  * divisions — no float ever crosses an aggregation boundary.
  */
object Retrieval {

  /** Query-likelihood BM25 top-k — score every document against each
    * query's distinct terms (k1 = 1.2, b = 0.75, the q137/X85
    * constants) and keep the `k` best per query:
    * `(query_id, rank, doc_id, score_micro)`.
    *
    * Per-term contribution = the exact q137 scoring expression
    * (`idf · saturated-tf`, whose DuckDB expression-order parity is
    * already pinned by that oracle) rounded to an INTEGER at 1e-4
    * units — so the per-document score is an order-free integer sum
    * and the (score desc, doc_id) rank is engine-independent.
    *
    * Scale shape (the reason this is not "join everything"):
    *  - `dfreq` restricted to QUERY terms broadcasts into the posting
    *    scan, so the corpus-wide `tf` table is scanned once and only
    *    matching postings survive — fan-out is Σ df over the query's
    *    terms, never the corpus;
    *  - the df CEILING (`df · dfCeilingShare ≤ n_docs`, default: drop
    *    terms in > 1/10 of the corpus) is the standard stopword guard
    *    that keeps that fan-out bounded — a term carried by half the
    *    corpus would otherwise make the candidate set corpus-sized
    *    for near-zero idf gain;
    *  - doc length attaches to the bounded candidate set via a
    *    SHUFFLE_HASH join against the narrow 16 B/doc `dl` frame
    *    (at index-build time a production deployment denormalizes dl
    *    into the posting list; the join here keeps the operator
    *    self-contained);
    *  - the per-query cut is the bounded top-k aggregation
    *    ([[graft.operators.TopKAgg.perGroup]]), ≤ k rows per
    *    (mapper, query) before any exchange — never a corpus-wide
    *    window sort.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int = 10, dfCeilingShare: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(dfCeilingShare >= 1,
      s"dfCeilingShare must be >= 1, got $dfCeilingShare")
    val dl = docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = queries.select(col(qIdCol).as("query_id"),
        explode(split(col(qTextCol), " ")).as("term"))
      .filter(col("term") =!= "").distinct()
    // query-term df table: vocabulary joins the tiny query-term set
    // (broadcast), then the stopword ceiling — what survives is the
    // per-query posting fan-out budget
    val qsel = dfreq.join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .filter(col("df") * lit(dfCeilingShare.toLong) <= col("n_docs"))
      .select(col("term"), col("query_id"), col("df"),
        col("n_docs"), col("avgdl"))
    val cand = tf.join(broadcast(qsel), Seq("term"))
    val scored = cand
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
    graft.operators.TopKAgg
      .perGroup(scored, "query_id", "score_micro", "doc_id", k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro").cast("long").as("score_micro"))
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
