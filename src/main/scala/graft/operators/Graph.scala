package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics expressed as joins + exact aggregation.
  *
  * PageRank here is the synchronous power iteration: each round every
  * node sends `rank · w/Σw` along its out-edges and the new rank is
  * `(1−d)/N + d · Σ inbound`. On Spark that is one join (edges ⋈
  * ranks, both hash-partitioned on the source key) and one
  * aggregation per round — the classic Pregel step without a graph
  * framework, so Catalyst still prunes/pushes and AQE can broadcast
  * the rank side while it is small relative to the edge list.
  *
  * Determinism contract (the whole point of the design): a
  * distributed `SUM(double)` is partition-order dependent in its last
  * bits, which would make every iteration — and therefore the final
  * ranking — irreproducible across runs and engines. Instead each
  * edge contribution is a fixed sequence of scalar IEEE ops rounded
  * to 12 digits, the per-node sum runs EXACTLY in `DECIMAL(38,12)`
  * (order-independent), and only the final damped combine returns to
  * double. Re-running on a different partitioning, cluster size, or
  * engine evaluating the same formula yields identical bytes.
  *
  * Scale: per-round cost is one shuffle of the edge list on `src`
  * plus one on `dst` — no all-pairs term anywhere; rank-frame lineage
  * is cut with `localCheckpoint` every `checkpointEvery` rounds so a
  * long power iteration does not accrete an unbounded plan (same
  * pattern as the dup-cluster pointer jumping in
  * `llm/Dedup.dupClusters`). The single driver-side action is one
  * `count()` for N.
  */
object Graph {

  /** Weighted PageRank over a directed edge list `(src, dst, w)`.
    *
    * Nodes with no inbound edges keep the `(1−d)/N` baseline each
    * round; dangling-node mass is NOT redistributed (the simplified
    * textbook variant) — ranks sum to slightly under 1 when sinks
    * exist, which is fine for ranking and keeps the oracle formula
    * closed-form. Output: `(node, rank)` with rank rounded to
    * `outDigits`.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, iters: Int, damping: Double = 0.85,
               outDigits: Int = 8, checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
    val outDeg = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // One tiny driver action: N. The per-round base (1-d)/N is then a
    // literal, so both engines evaluate the same two IEEE ops.
    val nNodes = nodes.count()
    val base = (1.0 - damping) / nNodes

    var ranks = nodes.withColumn("r", lit(1.0 / nNodes))
    for (i <- 1 to iters) {
      val contrib = e
        .join(outDeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          // scalar double ops in a fixed order, then rounded: the
          // only nondeterministic step (the SUM) runs in decimal
          round(col("r") * col("w") / col("wout"), 12)
            .cast(DecimalType(38, 12)).as("c"))
      val next = contrib.groupBy(col("node"))
        .agg(round(lit(base) +
          lit(damping) * sum(col("c")).cast("double"), 12).as("r"))
      ranks = nodes.join(next, Seq("node"), "left")
        .select(col("node"), coalesce(col("r"), round(lit(base), 12)).as("r"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), round(col("r"), outDigits).as("rank"))
  }
}
