package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a curated corpus and a
  * pretraining batch: documents are concatenated per stratum into one
  * token stream and cut into fixed-size context windows. The operator
  * computes, for every document, WHERE it lands: its pack (context
  * window) id and token offset inside that pack. Downstream loaders
  * use exactly this mapping to build packed batches without padding
  * waste.
  *
  * Deterministic contiguous packing: docs are ordered by the id within
  * each stratum (reproducible on any partitioning), token counts
  * cumulative-summed, and a doc's pack is where its FIRST token falls
  * — `floor(start / contextLen)`. Docs may straddle a boundary, as in
  * real token-stream packing (the loader splits them); bin-packing
  * variants that avoid straddling trade determinism and shuffle cost
  * for it.
  *
  * Scale shape: one keyed shuffle (the per-stratum window). Strata are
  * independent streams, so a 100 TB corpus packs in parallel across
  * them; within a stratum the cumulative sum is the same partitioned
  * window every running-total query uses.
  */
object Packing {

  /** @param contextLen tokens per context window (pack)
    * @return idCol, groupCol, n_tok, pack_id, tok_offset
    */
  def contiguousPack(docs: DataFrame, idCol: String, textCol: String,
                     groupCol: String, contextLen: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs
      .select(col(idCol), col(groupCol),
        size(split(col(textCol), " ")).as("n_tok"))
      .withColumn("_start", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col(idCol), col(groupCol), col("n_tok"),
        floor(col("_start") / contextLen).as("pack_id"),
        (col("_start") % contextLen).cast("int").as("tok_offset"))
  }

  /** NO-STRADDLE packing by length class: every document lands whole
    * inside one context window (no cross-boundary splits, no cross-
    * document attention contamination — the packing shape SFT and
    * long-context pipelines need, vs [[contiguousPack]]'s token-stream
    * cut). Documents of the same token length `L` pack
    * `cap = ⌊contextLen/L⌋` per window, so the assignment is pure
    * arithmetic on a per-class ordinal: window `(rn−1) div cap`, slot
    * `(rn−1) mod cap`.
    *
    * Scale design: a class ordinal needs a per-(stratum, length) sort
    * — and common lengths are populous enough at corpus scale that a
    * single class must never become one sort partition. The ordinal is
    * therefore computed per `(stratum, length, salt-block)` with the
    * block drawn from the id's md5 (`saltBlocks` spreads any class
    * over that many independent partitions); every window of a class
    * has identical capacity, so blocks pack independently with NO
    * cross-block coordination — the only cost is ≤ 1 partial window
    * per block·class instead of per class. Pack identity is the tuple
    * `(groupCol, n_tok, block, pack_seq)`.
    *
    * Documents longer than `contextLen` cannot be packed whole:
    * they surface with `pack_seq = -1, slot = -1` for the caller to
    * route through chunking ([[Dedup.chunkDedup]]'s splitter shape).
    *
    * `saltBlocks` is the scale dial, NOT a tuning nicety: a populous
    * (group, length) class lands entirely in `saltBlocks` window
    * partitions, so at corpus scale it MUST be sized like a partition
    * count (≈ `spark.sql.shuffle.partitions`), or a common length
    * class becomes a heavy single-task sort. The default `0` means
    * "auto": the session's shuffle-partition count. Results are a
    * function of `saltBlocks` (the md5 block assignment changes), so
    * oracled/pinned callers pass it explicitly.
    *
    * Output: `(idCol, groupCol, n_tok, block, pack_seq, slot)` —
    * deterministic on any partitioning and replayable in SQL.
    */
  def bucketPack(docs: DataFrame, idCol: String, textCol: String,
                 groupCol: String, contextLen: Int,
                 saltBlocks: Int = 0): DataFrame =
    bucketPackCounted(
      docs.select(col(idCol), col(groupCol),
        size(split(col(textCol), " ")).as("n_tok")),
      idCol, "n_tok", groupCol, contextLen, saltBlocks)

  /** [[bucketPack]] over a PRECOMPUTED per-doc token count — the
    * composition point for a real tokenizer: feed `n_bpe` from
    * [[Bpe.encodeTokenCountsWith]] and windows are budgeted in TRUE
    * BPE tokens instead of whitespace words (what an SFT/long-context
    * packer actually needs). Same contract, output, and scale design
    * as [[bucketPack]]; `nTokCol` must be positive and integral.
    */
  def bucketPackCounted(docs: DataFrame, idCol: String, nTokCol: String,
                        groupCol: String, contextLen: Int,
                        saltBlocks: Int = 0): DataFrame = {
    val blocks =
      if (saltBlocks > 0) saltBlocks
      else docs.sparkSession.sessionState.conf.numShufflePartitions
    val base = docs.select(col(idCol), col(groupCol),
        col(nTokCol).cast("int").as("n_tok"))
      .withColumn("block",
        (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long") % blocks).cast("int"))
    val w = Window.partitionBy(col(groupCol), col("n_tok"), col("block"))
      .orderBy(col(idCol))
    val cap = floor(lit(contextLen).cast("double") / col("n_tok"))
    base.withColumn("_rn", row_number().over(w))
      .select(col(idCol), col(groupCol), col("n_tok"), col("block"),
        when(col("n_tok") > contextLen, lit(-1L))
          .otherwise(floor((col("_rn") - 1) / cap)).as("pack_seq"),
        when(col("n_tok") > contextLen, lit(-1))
          .otherwise(((col("_rn") - 1) % cap).cast("int")).as("slot"))
  }

  /** Materialize packed context windows — the FINAL artifact of the
    * curation pipeline, the ready-to-train row a pretraining loader
    * reads: each [[bucketPackCounted]] assignment joins its
    * document's token-id sequence (`Bpe.encodeIds` shape) and every
    * window emits ONE row with the concatenated id stream, documents
    * in slot order with `sepId` between them (the document-boundary
    * marker — the EOS analog; the separator rides outside the token
    * budget by contract, windows being same-length-class). Over-long
    * docs (`pack_seq = -1`, the chunking route) are excluded.
    *
    * Output: `(groupCol, n_tok, block, pack_seq, n_docs, ids, n_ids)`.
    *
    * Scale: one equi-join on the doc key plus ONE keyed aggregation
    * per window with an in-row sort over the window's own documents
    * (≤ contextLen/n_tok entries); the window key carries the salt
    * block, so nothing anywhere materializes more than one training
    * window of ids.
    */
  def materializeWindows(packs: DataFrame, ids: DataFrame, idCol: String,
                         idsCol: String, groupCol: String,
                         sepId: Int = -2): DataFrame =
    packs.filter(col("pack_seq") >= 0)
      .join(ids.select(col(idCol), col(idsCol).as("_ids")), Seq(idCol))
      .groupBy(col(groupCol), col("n_tok"), col("block"), col("pack_seq"))
      .agg(
        sort_array(collect_list(struct(col("slot"), col("_ids"))))
          .as("_ds"),
        count(lit(1)).as("n_docs"))
      .select(col(groupCol), col("n_tok"), col("block"), col("pack_seq"),
        col("n_docs"),
        expr("flatten(transform(_ds, (d, i) -> " +
          s"IF(i = 0, d._ids, concat(array($sepId), d._ids))))").as("ids"))
      .withColumn("n_ids", size(col("ids")))
}
