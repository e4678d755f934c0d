package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts: K4 gives every node 3 triangles") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = Graph.triangleCounts(e.toDF("s", "d"), "s", "d")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: paths have none; reversed/dup edges tolerated") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(Graph.triangleCounts(path.toDF("s", "d"), "s", "d").count() === 0L)
    // one triangle given redundantly in both orientations + dup
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L), (1L, 2L))
    val r = Graph.triangleCounts(e.toDF("s", "d"), "s", "d")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: hub fan with one closed pair counts exactly once") {
    // hub 0 connected to 1..10, plus single leaf-leaf edge (3,4)
    val e = (1L to 10L).map(i => (0L, i)) :+ ((3L, 4L))
    val r = Graph.triangleCounts(e.toDF("s", "d"), "s", "d")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(0L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("sparsifyByDegree keeps each node's strongest edges (union semantics)") {
    // hub 0 with weights 5,4,3,2,1 to nodes 1..5; cap 2 — hub keeps
    // (0,1),(0,2) but every leaf keeps its only edge, so ALL survive
    // via the union rule except none are dropped; with leaf-leaf
    // edges below rank the hub's cap actually binds
    val e = Seq((0L, 1L, 5L), (0L, 2L, 4L), (0L, 3L, 3L), (0L, 4L, 2L),
      (0L, 5L, 1L)).toDF("s", "d", "w")
    val kept = Graph.sparsifyByDegree(e, "s", "d", "w", maxDegree = 2)
      .as[(Long, Long)].collect().toSet
    // leaves keep their single incident edge regardless of hub rank
    assert(kept === Set((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L)))
    // without leaf-side retention (cap on hub only) it would be 2 —
    // now drop leaf edges by giving each leaf a better alternative
    val e2 = e.union(Seq((1L, 2L, 9L), (3L, 4L, 9L), (3L, 5L, 8L),
      (4L, 5L, 8L), (1L, 3L, 7L), (2L, 4L, 7L), (2L, 5L, 6L), (1L, 4L, 6L),
      (1L, 5L, 6L), (2L, 3L, 6L)).toDF("s", "d", "w"))
    val kept2 = Graph.sparsifyByDegree(e2, "s", "d", "w", maxDegree = 2)
      .as[(Long, Long)].collect().toSet
    // every leaf now has two ≥6-weight edges outranking its hub edge;
    // the hub keeps only its top-2 → exactly (0,1),(0,2) survive from
    // the star
    assert(kept2.filter(_._1 == 0L) === Set((0L, 1L), (0L, 2L)))
    assert(kept2.forall { case (a, b) => a < b })
  }

  test("looTargetEncode excludes the row's own target; singletons NULL") {
    val df = Seq(
      ("a", 1), ("a", 0), ("a", 1),   // sums: 2 of 3
      ("b", 1)                        // singleton
    ).toDF("cat", "t")
    val out = Features.looTargetEncode(df, "cat", col("t"))
      .select("cat", "t", "enc").collect()
    val a1 = out.filter(r => r.getString(0) == "a" && r.getInt(1) == 1)
    val a0 = out.filter(r => r.getString(0) == "a" && r.getInt(1) == 0)
    // for t=1 rows: (2-1)/2 = 0.5 ; for t=0 row: (2-0)/2 = 1.0
    assert(a1.forall(_.getDouble(2) === 0.5))
    assert(a0.forall(_.getDouble(2) === 1.0))
    assert(out.filter(_.getString(0) == "b").forall(_.isNullAt(2)))
  }

  test("cuped: perfectly correlated covariate removes ~all variance; constant covariate none") {
    // y = 2x exactly → theta = 2, var_adj = 0, reduction = 0
    val u1 = (1 to 40).map(i => ("a", i.toDouble, 2.0 * i))
    val out1 = Features.cuped(u1.toDF("g", "pre", "post"), "g", "pre", "post")
      .collect().head
    assert(math.abs(out1.getDouble(2) - 2.0) < 1e-9)   // theta
    assert(math.abs(out1.getDouble(4)) < 1e-9)         // var_adj
    assert(math.abs(out1.getDouble(5)) < 1e-9)         // reduction
    // independent x (alternating) ≈ no reduction: reduction near 1
    val u2 = (1 to 40).map(i => ("a", (i % 2).toDouble, i.toDouble))
    val out2 = Features.cuped(u2.toDF("g", "pre", "post"), "g", "pre", "post")
      .collect().head
    assert(out2.getDouble(5) > 0.95)
  }

  test("weightedMedian: weights shift the cut; exact boundary picks lower value") {
    val df = Seq(
      ("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 5L), ("g", 3.0, 3L),
      ("h", 1.0, 2L), ("h", 1.0, 3L), ("h", 9.0, 5L) // tie at half: lower
    ).toDF("grp", "v", "w")
    val out = Features.weightedMedian(df, "grp", "v", "w")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("g") === 3.0)  // cum 1,2,10 vs tot 10 → first 2*cum>=10 is 3.0
    assert(out("h") === 1.0)  // 2*5 >= 10 already at the first row
  }

  test("countConcentration: uniform keys → gini 0; all-in-one-key → near 1") {
    val uniform = (1 to 100).map(i => ("k" + i))
    val out1 = Features.countConcentration(uniform.toDF("k"), "k")
      .collect().head
    assert(out1.getLong(0) === 100L && out1.getLong(1) === 100L)
    assert(out1.getDouble(2) === 0.0)
    assert(out1.getDouble(3) === 0.01)
    // 901 rows on one key + 99 singletons: heavy concentration
    val skew = Seq.fill(901)("hot") ++ (1 to 99).map("k" + _)
    val out2 = Features.countConcentration(skew.toDF("k"), "k")
      .collect().head
    assert(out2.getLong(0) === 100L && out2.getLong(1) === 1000L)
    assert(out2.getDouble(2) > 0.85)
    assert(out2.getDouble(3) === 0.901)
    assert(out2.getDouble(4) === 0.91)  // hot + 9 singletons
  }

  test("assocRules: confidence and lift from exact basket counts") {
    // 4 baskets: {a,b} ×3, {a,c} ×1 → supp(a)=4, supp(b)=3, supp(c)=1
    val bi = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (4L, "a"), (4L, "c")).toDF("bk", "it")
    val out = Features.assocRules(bi, "bk", "it", minSupport = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // b→a: supp 3, conf 3/3 = 1, lift 4·3/(3·4) = 1
    assert(out(("b", "a")) === ((3L, 1.0, 1.0)))
    // a→b: conf 3/4 = 0.75, lift 4·3/(4·3) = 1
    assert(out(("a", "b")) === ((3L, 0.75, 1.0)))
    // c→a: conf 1, lift 4·1/(1·4) = 1 ; a→c: conf 0.25
    assert(out(("a", "c"))._2 === 0.25)
    // duplicate items in one basket must not inflate support
    val dup = bi.union(Seq((1L, "a")).toDF("bk", "it"))
    val out2 = Features.assocRules(dup, "bk", "it", 1L, 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out2(("a", "b")) === 3L)
  }

  test("madOutliers: known median/MAD; a far point is flagged") {
    // group g: values 1..9 plus outlier 100 → med 5 (lower-of-even
    // via 2·cum ≥ tot on 10 values → 5), deviations |x−5|:
    // 0,1,1,2,2,3,3,4,4,95 → mad = lower median = 2
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ (("g", 100.0)))
      .toDF("grp", "value")
    val out = Features.madOutliers(df, "grp", "value", cut = 3.0).collect()
    val r = out.head
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 5.0)
    assert(r.getDouble(3) === 2.0)
    assert(r.getLong(4) === 1L)   // only 100 exceeds 5 ± 6
  }

  test("quantileNormalize aligns group CDFs onto the global distribution") {
    // groups a={1,2,3}, b={11,12,13}; global CDF: 1→1/6, 2→1/3,
    // 3→1/2, 11→2/3, 12→5/6, 13→1
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("grp", "value")
    val out = Features.quantileNormalize(df, "grp", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3))
      .toMap
    // b's 1/3-quantile lands on the global 1/3 point (value 2,
    // CDF-tie resolved ref-first), 2/3 on 11, 1.0 on 13
    assert(out(("b", 11.0)) === 2.0)
    assert(out(("b", 12.0)) === 11.0)
    assert(out(("b", 13.0)) === 13.0)
    assert(out(("a", 1.0)) === 2.0)
    // a degenerate single-group frame maps every value to itself
    val self = Features.quantileNormalize(df.filter($"grp" === "a")
        .union(Seq.empty[(String, Double)].toDF("grp", "value")),
      "grp", "value")
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(self === Map(1.0 -> 1.0, 2.0 -> 2.0, 3.0 -> 3.0))
  }

  test("rollingCorr: perfect/anti correlation, short frames and flat series NULL") {
    // y = 2x for days 1..10 → corr 1.0 once the frame has ≥3 rows
    val up = (1 to 10).map(i => (i, i.toDouble, 2.0 * i))
    val out = Features.rollingCorr(up.toDF("d", "x", "y"), "d", "x", "y",
        lookback = 7)
      .collect().map(r => r.getInt(0) -> ((r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    assert(out(1) === ((1L, null)))       // frame too short
    assert(out(2) === ((2L, null)))
    assert(out(3) === ((3L, 1.0)))
    assert(out(10) === ((7L, 1.0)))       // full 7-row frame
    // anti-correlated
    val dn = (1 to 8).map(i => (i, i.toDouble, 100.0 - 3 * i))
    val a = Features.rollingCorr(dn.toDF("d", "x", "y"), "d", "x", "y", 7)
      .collect().filterNot(_.isNullAt(4))
      .map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(a(8) === -1.0)
    // constant x → zero variance → NULL, not Inf/NaN
    val flat = (1 to 6).map(i => (i, 5.0, i.toDouble))
    val f = Features.rollingCorr(flat.toDF("d", "x", "y"), "d", "x", "y", 7)
      .collect()
    assert(f.forall(_.isNullAt(4)))
  }

  test("looTargetEncode: NULL categories pass through with NULL enc") {
    val df = Seq[(String, Integer)](("a", 1), ("a", 0), (null, 1), (null, 0))
      .toDF("cat", "t")
    val out = Features.looTargetEncode(df, "cat", col("t")).collect()
    assert(out.length === 4) // inner join used to drop the NULL-cat rows
    assert(out.filter(_.isNullAt(0)).length === 2)
    assert(out.filter(_.isNullAt(0)).forall(_.isNullAt(2)))
  }

  test("welchPairs/cuped: zero-variance groups yield NULL, not NaN/Inf") {
    // both groups all-constant → se_a + se_b = 0; t and dof undefined
    val df = (Seq.fill(5)(("a", 3.0)) ++ Seq.fill(7)(("b", 8.0)))
      .toDF("grp", "value")
    val w = Features.welchPairs(df, "grp", "value").collect().head
    assert(w.isNullAt(4) && w.isNullAt(5))
    // constant covariate → vx = 0 → theta/var_adj/reduction NULL
    val u = (1 to 10).map(i => ("a", 5.0, i.toDouble))
    val c = Features.cuped(u.toDF("g", "pre", "post"), "g", "pre", "post")
      .collect().head
    assert(c.isNullAt(2) && c.isNullAt(4) && c.isNullAt(5))
    assert(!c.isNullAt(3)) // var_y is still defined
  }

  test("welchPairs: identical groups give t=0; known case matches closed form") {
    val df = Seq.tabulate(20)(i => ("a", (i % 5 + 1).toDouble)) ++
      Seq.tabulate(20)(i => ("b", (i % 5 + 1).toDouble)) ++
      Seq.tabulate(10)(i => ("c", (i % 3 + 10).toDouble))
    val out = Features.welchPairs(df.toDF("grp", "value"), "grp", "value")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(("a", "b"))._3 === 0.0)
    // independent recompute of the a-vs-c case
    val va = Seq.tabulate(20)(i => (i % 5 + 1).toDouble)
    val vc = Seq.tabulate(10)(i => (i % 3 + 10).toDouble)
    def mv(xs: Seq[Double]) = {
      val n = xs.size; val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, sa) = mv(va); val (nc, mc, sc) = mv(vc)
    val se = sa / na + sc / nc
    val tExp = (ma - mc) / math.sqrt(se)
    val dofExp = se * se /
      ((sa / na) * (sa / na) / (na - 1) + (sc / nc) * (sc / nc) / (nc - 1))
    val (gotNa, gotNc, gotT, gotDof) = out(("a", "c"))
    assert(gotNa === 20L && gotNc === 10L)
    assert(math.abs(gotT - tExp) < 1e-3)
    assert(math.abs(gotDof - dofExp) < 1e-2)
  }

  test("quantileNormalize binDigits bounds both CDF windows to the bin " +
    "histogram and matches the unbinned result on pre-binned input") {
    import org.apache.spark.sql.functions._
    // continuous values: distinct ≈ rows; binned at d=0 → ≤ 11 bins
    val df = (0 until 5000).map { i =>
      (if (i % 2 == 0) "a" else "b",
        (i * 2654435761L % 100003).toDouble / 10000.3)
    }.toDF("grp", "value")
    assert(df.select(col("value")).distinct().count() > 2500)
    val binned = Features.quantileNormalize(df, "grp", "value",
      binDigits = Some(0)).collect()
    // the window inputs are the bin histograms: every v is integral
    assert(binned.forall(r => r.getDouble(1) == math.floor(r.getDouble(1))))
    // binning first == running the unbinned operator on floored input
    val pre = df.select(col("grp"),
      (floor(col("value") * 1.0) / 1.0).as("value"))
    val expect = Features.quantileNormalize(pre, "grp", "value").collect()
    assert(binned.map(_.toSeq).toSet == expect.map(_.toSeq).toSet)
  }
}
