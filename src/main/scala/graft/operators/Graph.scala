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
  /** Shared power-iteration state: checkpointed edge list, out-degree
    * totals, node frame, and the literal damping base.
    */
  private final case class PrState(e: DataFrame, outDeg: DataFrame,
                                   nodes: DataFrame, base: Double,
                                   damping: Double, nNodes: Long) {
    /** One synchronous PageRank round over `ranks(node, r)`. */
    def step(ranks: DataFrame): DataFrame = {
      // SHUFFLE_HASH on the node-sized sides: build the hash on
      // degrees/ranks and STREAM the pre-partitioned edge list — scale-
      // stable (no size-threshold plan flip, no per-round edge sort)
      val contrib = e
        .join(outDeg.hint("shuffle_hash"), "src")
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"),
          "src")
        .select(col("dst").as("node"),
          // scalar double ops in a fixed order, then rounded: the
          // only nondeterministic step (the SUM) runs in decimal
          round(col("r") * col("w") / col("wout"), 12)
            .cast(DecimalType(38, 12)).as("c"))
      val next = contrib.groupBy(col("node"))
        .agg(round(lit(base) +
          lit(damping) * sum(col("c")).cast("double"), 12).as("r"))
      nodes.join(next, Seq("node"), "left")
        .select(col("node"), coalesce(col("r"), round(lit(base), 12)).as("r"))
    }
    def init: DataFrame = nodes.withColumn("r", lit(1.0 / nNodes))
  }

  private def prepare(edges: DataFrame, srcCol: String, dstCol: String,
                      wCol: String, damping: Double): PrState = {
    // The edge list is consumed once per iteration plus by the
    // degree/node prep — materialize it ONCE (upstream edge
    // construction is often a join/aggregation that would otherwise
    // re-run every time the lazy plan is referenced), PRE-PARTITIONED
    // on src: the checkpoint pins HashPartitioning(src), so every
    // round's e ⋈ outDeg ⋈ ranks joins exchange NOTHING on the edge
    // side (and outDeg aggregates exchange-free off the same
    // partitioning) — the rounds' only edge-scale shuffle is the
    // contribution groupBy(dst), which is the algorithm. Without the
    // pin the per-round join re-plans by SIZE: node frames below the
    // broadcast threshold broadcast (no edge shuffle), past it — the
    // graph third decade, 2M nodes — the join flips to sort-merge and
    // re-shuffles + re-sorts the full edge list EVERY round. The
    // round-12 smoke caught exactly that once the shared-edge memo
    // exposed the marginal round cost: 17× at 10× data, plan-flip
    // attributed, ~linear after this pin (SCALE.md round 12).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
      .repartition(col("src")).localCheckpoint()
    val outDeg = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // One tiny driver action: N. The per-round base (1-d)/N is then a
    // literal, so both engines evaluate the same two IEEE ops.
    val nNodes = nodes.count()
    PrState(e, outDeg, nodes, (1.0 - damping) / nNodes, damping, nNodes)
  }

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, iters: Int, damping: Double = 0.85,
               outDigits: Int = 8, checkpointEvery: Int = 1): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val st = prepare(edges, srcCol, dstCol, wCol, damping)
    var ranks = st.init
    for (i <- 1 to iters) {
      ranks = st.step(ranks)
      // materialize EVERY round by default (node-count rows — cheap):
      // the rank frame feeds the next round through a BROADCAST whose
      // build side otherwise re-executes every earlier round's
      // edge-scale join/agg — measured 12 s → 30 s → 81 s of CPU over
      // 3 rounds before this, flat ~10 s/round after
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), round(col("r"), outDigits).as("rank"))
  }

  /** PERSONALIZED PageRank: teleport mass goes only to a trusted SEED
    * set — the seed-based quality-propagation technique a curation
    * pipeline uses to SELECT data (score every document/domain by its
    * graph proximity to a small curated set; rank is trust, the
    * selection cut is a threshold or top-k). `r₀ = t`,
    * `rₖ(v) = (1−d)·t(v) + d·Σ_in rₖ₋₁(src)·w/wout` with
    * `t(v) = 1/|seeds|` on seeds and 0 elsewhere.
    *
    * Same determinism contract and scale shape as [[pageRank]]: one
    * edge-scale join + decimal-summed aggregation per round,
    * node-count rank frames localCheckpointed every round, the seed
    * share a driver literal. Seeds not present in the graph are
    * ignored (they can receive no mass and would only dilute the
    * teleport); dangling-node mass evaporates (the simple PPR
    * variant — replayable verbatim in SQL).
    *
    * Output: `(node, rank)`; seed rows carry the teleport floor
    * `(1−d)/|seeds|` plus whatever the graph returns them.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           wCol: String, seeds: DataFrame, seedCol: String,
                           iters: Int, damping: Double = 0.85,
                           outDigits: Int = 8): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val st = prepare(edges, srcCol, dstCol, wCol, damping)
    val seedSet = seeds.select(col(seedCol).as("node")).distinct()
      .join(st.nodes, Seq("node"), "left_semi")
    val nSeeds = seedSet.count()
    require(nSeeds > 0, "no seed is a node of the graph")
    val tele = st.nodes
      .join(seedSet.withColumn("_s", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("_s").isNotNull, lit(1.0 / nSeeds))
          .otherwise(lit(0.0)).as("t"))
      .localCheckpoint()
    var ranks = tele.select(col("node"), col("t").as("r"))
    for (i <- 1 to iters) {
      // same stream-the-edges plan pin as PrState.step
      val m = st.e.join(st.outDeg.hint("shuffle_hash"), "src")
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"),
          "src")
        .select(col("dst").as("node"),
          round(col("r") * col("w") / col("wout"), 12)
            .cast(DecimalType(38, 12)).as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).cast("double").as("_m"))
      ranks = tele.join(m, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) * col("t") +
            lit(damping) * coalesce(col("_m"), lit(0.0)), 12).as("r"))
      if (i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), round(col("r"), outDigits).as("rank"))
  }

  /** PageRank iterated to a fixed point: rounds run until the max
    * per-node rank change drops below `tol` (one tiny driver action
    * per round — the convergence check IS the loop condition, the
    * same driver-loop shape as `Dedup.dupClusters`). Every round is
    * localCheckpointed, so the plan stays one-round deep no matter
    * how many rounds the graph needs. Returns
    * `(node, rank, n_iters)` with the round count attached for
    * observability.
    */
  def pageRankConverged(edges: DataFrame, srcCol: String, dstCol: String,
                        wCol: String, tol: Double = 1e-9,
                        maxIters: Int = 50, damping: Double = 0.85,
                        outDigits: Int = 8): DataFrame = {
    require(tol > 0 && maxIters >= 1, "need tol > 0 and maxIters >= 1")
    val st = prepare(edges, srcCol, dstCol, wCol, damping)
    var ranks = st.init.localCheckpoint()
    var iters = 0
    var delta = Double.MaxValue
    while (delta >= tol && iters < maxIters) {
      val next = st.step(ranks).localCheckpoint()
      delta = next.join(ranks.withColumnRenamed("r", "r0"), "node")
        .agg(max(abs(col("r") - col("r0")))).head().getDouble(0)
      ranks = next
      iters += 1
    }
    ranks.select(col("node"), round(col("r"), outDigits).as("rank"),
      lit(iters).as("n_iters"))
  }

  /** HITS hubs & authorities over a directed (typically bipartite)
    * edge list: `auth(p) = Σ h(c)` over in-edges, `hub(c) = Σ a(p)`
    * over out-edges, L1-normalized each half-round. Same determinism
    * contract as [[pageRank]]: scores are rounded to 12 digits before
    * every DECIMAL(38,12) sum, and the normalizer rides a 1-row
    * broadcast (no driver action in the loop). Returns
    * `(hubs(id, h), authorities(id, a))`.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, "iters must be >= 1")
    // two pinned copies, one per half-round join key: the same
    // stream-the-edges discipline as [[prepare]] (a node-sized score
    // frame past the broadcast threshold otherwise flips each half to
    // a sort-merge join re-shuffling the edge list every round); the
    // second copy costs one bounded materialization up front and
    // removes a per-round edge exchange forever after
    val eBySrc = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().repartition(col("src")).localCheckpoint()
    val eByDst = eBySrc.repartition(col("dst")).localCheckpoint()

    def half(scores: DataFrame, joinKey: String, outKey: String,
             scoreCol: String, outCol: String): DataFrame = {
      val e = if (joinKey == "src") eBySrc else eByDst
      val raw = e.join(scores.withColumnRenamed("id", joinKey)
          .hint("shuffle_hash"), joinKey)
        .select(col(outKey).as("id"),
          round(col(scoreCol), 12).cast(DecimalType(38, 12)).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("raw"))
      val nrm = raw.agg(sum(col("raw")).as("nrm"))
      // materialize each half-round (node-count rows): the next half
      // consumes this through a broadcast whose build side would
      // otherwise re-execute every earlier half's edge-scale work
      // (the q142 lesson)
      raw.crossJoin(broadcast(nrm))
        .select(col("id"),
          round(col("raw").cast("double") / col("nrm").cast("double"), 12)
            .as(outCol))
        .localCheckpoint()
    }

    var hub = eBySrc.select(col("src").as("id")).distinct()
      .withColumn("h", lit(1.0))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      auth = half(hub, "src", "dst", "h", "a")
      hub = half(auth, "dst", "src", "a", "h")
    }
    (hub, auth)
  }

  /** Degree-capped sparsification of a weighted undirected graph:
    * every node keeps its `maxDegree` strongest incident edges
    * (weight desc, neighbor id tiebreak) and an edge survives if
    * EITHER endpoint keeps it — the standard kNN-graph union. Output
    * is the canonical `(a < b)` edge set.
    *
    * Why this exists: any absolute edge filter (weight ≥ T) densifies
    * as the corpus grows — repeated/duplicated data inflates every
    * co-occurrence weight past the threshold, degrees grow linearly
    * with scale, and downstream wedge/pair work grows QUADRATICALLY
    * (measured 22× at a 10× scale smoke before this cap existed).
    * A per-node cap makes downstream cost a contract: at most
    * `n · maxDegree` edges and `n · maxDegree²` wedges, whatever the
    * data does. One shuffle (the per-node rank window).
    */
  def sparsifyByDegree(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, maxDegree: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = edges.select(col(srcCol).as("s"), col(dstCol).as("d"),
        col(wCol).as("w"))
      .union(edges.select(col(dstCol).as("s"), col(srcCol).as("d"),
        col(wCol).as("w")))
    val rank = Window.partitionBy(col("s"))
      .orderBy(col("w").desc, col("d").asc)
    sym.withColumn("_rn", row_number().over(rank))
      .filter(col("_rn") <= maxDegree)
      .select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"))
      .distinct()
  }

  /** Per-node triangle counts over an undirected graph given as an
    * edge list (either orientation, duplicates tolerated).
    *
    * Scale design — degree orientation: enumerating wedges from raw
    * adjacency costs Σ deg(v)², which a single hub can turn
    * quadratic. Orienting every edge from its lower-(degree, id)
    * endpoint to the higher caps oriented out-degree at O(√m), so
    * wedge generation is O(m^1.5) worst case — the optimal exact
    * bound — and the hub's wedges are generated by its (low-degree)
    * neighbors instead of the hub itself. Every step is an equi-join
    * or hash aggregation on node/edge keys; nothing touches the
    * driver.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected edge set (a < b), deduped — materialized
    // once: it feeds degree counting, orientation, and the wedge
    // close, and its upstream construction should not re-run 3×
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient low → high by (deg, id); ties on degree break on id so
    // the orientation is total and acyclic
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("degb")), "b")
      .select(
        when(col("dega") < col("degb") ||
          (col("dega") === col("degb") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // wedges u→v1, u→v2 (v1 < v2) closed by the canonical edge set
    val wedges = oriented.as("x").join(oriented.as("y"), "u")
      .filter(col("x.v") < col("y.v"))
      .select(col("u"), col("x.v").as("a"), col("y.v").as("b"))
    val tris = wedges.join(und, Seq("a", "b"))
    tris.select(col("u").as("node"))
      .union(tris.select(col("a").as("node")))
      .union(tris.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
