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
}
