package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)], iters: Int = 3) =
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("symmetric pair converges to equal ranks summing to 1") {
    val r = ranks(Seq((1L, 2L, 1L), (2L, 1L, 1L)))
    assert(r(1L) === r(2L))
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("hub of a star outranks leaves; mass is conserved (no sinks)") {
    // star with back-edges: hub 0 <-> leaves 1..4
    val e = (1L to 4L).flatMap(i => Seq((0L, i, 1L), (i, 0L, 1L)))
    val r = ranks(e)
    assert((1L to 4L).forall(i => r(0L) > r(i)))
    assert((1L to 4L).forall(i => r(i) === r(1L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("weighted edges steer rank toward the heavy target") {
    // 1 sends 9/10 of its mass to 2 and 1/10 to 3; back edges keep
    // the graph sink-free
    val e = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val r = ranks(e)
    assert(r(2L) > r(3L))
  }

  test("dangling sink keeps baseline inflow only and leaks mass") {
    // 1 -> 2 with no return: 2 is a sink (simplified variant leaks
    // its mass); 1 receives only the (1-d)/N baseline
    val r = ranks(Seq((1L, 2L, 1L)), iters = 2)
    assert(r(2L) > r(1L))
    assert(r.values.sum < 1.0)
  }

  test("rank is invariant under input partitioning (decimal-exact sums)") {
    val e = (1L to 200L).map(i => (i, (i * 7) % 200 + 1, i % 5 + 1))
    val df1 = e.toDF("src", "dst", "w").repartition(1)
    val df13 = e.toDF("src", "dst", "w").repartition(13)
    val a = Graph.pageRank(df1, "src", "dst", "w", 4)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(df13, "src", "dst", "w", 4)
      .orderBy("node").collect().toSeq
    assert(a === b)
  }

  test("pageRankConverged reaches the fixed point and reports rounds") {
    // 3-cycle: fixed point is uniform 1/3 from the uniform start —
    // converges immediately (delta 0 after one round)
    val cyc = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
    val c = Graph.pageRankConverged(cyc.toDF("src", "dst", "w"),
      "src", "dst", "w", tol = 1e-9, maxIters = 50)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2))))
      .toMap
    assert(c.values.forall { case (r, _) => math.abs(r - 1.0 / 3) < 1e-8 })
    assert(c.values.head._2 === 1)
    // asymmetric graph: converged ranks ≈ a long fixed-iteration run,
    // and more rounds than the cycle
    val e = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L),
      (2L, 3L, 2L))
    val conv = Graph.pageRankConverged(e.toDF("src", "dst", "w"),
      "src", "dst", "w", tol = 1e-10, maxIters = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fixed = Graph.pageRank(e.toDF("src", "dst", "w"),
      "src", "dst", "w", iters = 60, checkpointEvery = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(conv.keySet === fixed.keySet)
    assert(conv.forall { case (k, v) => math.abs(v - fixed(k)) < 1e-7 })
  }

  test("hits: shared part dominates authorities; richer basket boosts hub") {
    // customers 1,2,3 all buy part 10; customer 1 also buys part 11
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
    val (hub, auth) = Graph.hits(e.toDF("c", "p"), "c", "p", iters = 2)
    val a = auth.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val h = hub.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a(10L) > a(11L))
    assert(h(1L) > h(2L) && h(2L) === h(3L))
    // L1 normalized each half-round
    assert(math.abs(a.values.sum - 1.0) < 1e-9)
    assert(math.abs(h.values.sum - 1.0) < 1e-9)
  }

  test("checkpointEvery cuts lineage without changing the result") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
    val plain = ranks(e, iters = 6)
    val chk = Graph.pageRank(e.toDF("src", "dst", "w"), "src", "dst", "w",
        iters = 6, checkpointEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain === chk)
  }

  test("personalizedPageRank: mass concentrates near the seed; a node " +
       "unreachable from it keeps rank 0; off-graph seeds are ignored") {
    // two symmetric pairs, disconnected: {1,2} and {3,4}; seed = 1
    val e = Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 4L, 1L), (4L, 3L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L, 99L).toDF("node") // 99 is not a graph node
    val r = Graph.personalizedPageRank(e, "src", "dst", "w",
        seeds, "node", iters = 8)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // teleport share is 1/1 (seed 99 ignored), so total mass stays ~1
    assert(math.abs(r.values.sum - 1.0) < 1e-6, r.toString)
    assert(r(1L) > r(2L), "the seed keeps the teleport floor advantage")
    assert(r(2L) > 0.0)
    assert(r(3L) == 0.0 && r(4L) == 0.0,
      "components unreachable from the seed receive nothing")
    // exact single rounds from r0 = (1, 0) on the 2-cycle:
    // round 1 → (0.15, 0.85); round 2 → (0.15+0.85², 0.85·0.15)
    val one = Graph.personalizedPageRank(e, "src", "dst", "w",
        Seq(1L).toDF("node"), "node", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(one(1L) == 0.15 && one(2L) == 0.85, one.toString)
    val two = Graph.personalizedPageRank(e, "src", "dst", "w",
        Seq(1L).toDF("node"), "node", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(two(1L) == 0.8725 && two(2L) == 0.1275, two.toString)
  }

  test("personalizedPageRank splits teleport over multiple seeds and is " +
       "partitioning-invariant") {
    val e = (1L to 4L).flatMap(i => Seq((0L, i, 1L), (i, 0L, 1L)))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L, 2L).toDF("node")
    val a = Graph.personalizedPageRank(e, "src", "dst", "w", seeds,
        "node", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = Graph.personalizedPageRank(e.repartition(7), "src", "dst", "w",
        seeds.repartition(3), "node", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a === b, "decimal-summed rounds are partitioning-invariant")
    assert(a(1L) === a(2L), "symmetric seeds score equally")
    assert(a(1L) > a(3L) && a(3L) === a(4L),
      "non-seed leaves rank below seeds, equal among themselves")
    assert(a(0L) > a(3L), "the hub adjacent to both seeds beats far leaves")
  }
}
