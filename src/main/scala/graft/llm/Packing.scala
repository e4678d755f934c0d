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
}
