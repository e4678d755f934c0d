package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DdSketchSpec extends SparkSpec {
  import spark.implicits._

  test("merge-equivalence is exact: sketch(A ∪ B) == merge(sketch(A), sketch(B))") {
    val a = (1 to 500).map(i => math.exp(i / 100.0)).toDF("v")
    val b = (1 to 300).map(i => i * 0.37 + 0.01).toDF("v")
    val skA = a.agg(DdSketch.sketchAgg(col("v"))).head.getAs[Array[Byte]](0)
    val skB = b.agg(DdSketch.sketchAgg(col("v"))).head.getAs[Array[Byte]](0)
    val skU = a.union(b).agg(DdSketch.sketchAgg(col("v"))).head.getAs[Array[Byte]](0)
    val merged = Seq(skA, skB).toDF("sk")
      .agg(DdSketch.mergeAgg(col("sk"))).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(skU, merged), "sketch bytes must be bit-equal")
  }

  test("sketch bytes are partitioning-invariant") {
    val vals = (1 to 2000).map(i => (i % 37) * 1.5 + 0.25)
    val one = vals.toDF("v").repartition(1)
      .agg(DdSketch.sketchAgg(col("v"))).head.getAs[Array[Byte]](0)
    val many = vals.toDF("v").repartition(13)
      .agg(DdSketch.sketchAgg(col("v"))).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many))
  }

  test("relative error ≤ α at p50/p95/p99 across distributions") {
    val dists: Seq[(String, Seq[Double])] = Seq(
      "uniform" -> (1 to 5000).map(_ * 0.1),
      "lognormal-ish" -> (1 to 5000).map(i => math.exp((i % 97) / 10.0)),
      "heavy-tail" -> (1 to 5000).map(i => 1.0 / ((i % 100) / 1000.0 + 0.001)))
    for ((name, vals) <- dists; q <- Seq(0.5, 0.95, 0.99)) {
      val sk = vals.toDF("v").agg(DdSketch.sketchAgg(col("v")))
        .head.getAs[Array[Byte]](0)
      val est = DdSketch.quantileOf(sk, q)
      val sorted = vals.sorted
      val exact = sorted(math.max(0, math.ceil(q * vals.size).toInt - 1))
      assert(math.abs(est / exact - 1.0) <= DdSketch.Alpha + 1e-9,
        s"$name p$q: est=$est exact=$exact")
    }
  }

  test("non-positive values count in the zero bucket and estimate 0.0") {
    val sk = Seq(-5.0, 0.0, -0.1, 10.0).toDF("v")
      .agg(DdSketch.sketchAgg(col("v"))).head.getAs[Array[Byte]](0)
    assert(DdSketch.countAll(sk) == 4L)
    assert(DdSketch.quantileOf(sk, 0.5) == 0.0) // rank 2 of 4 → zero bucket
    assert(DdSketch.quantileOf(sk, 1.0) > 9.0)  // max lands in a log bucket
  }

  test("nulls are absence; empty sketch quantile is NaN") {
    val sk = Seq[(Integer, java.lang.Double)]((1, 2.0), (2, null), (3, 8.0))
      .toDF("id", "v").agg(DdSketch.sketchAgg(col("v")))
      .head.getAs[Array[Byte]](0)
    assert(DdSketch.countAll(sk) == 2L)
    val empty = Seq.empty[Double].toDF("v")
      .agg(DdSketch.sketchAgg(col("v"))).head.getAs[Array[Byte]](0)
    assert(DdSketch.countAll(empty) == 0L)
    assert(DdSketch.quantileOf(empty, 0.5).isNaN)
  }

  test("quantile estimates are monotone in q") {
    val vals = (1 to 1000).map(i => math.pow(1.01, i % 500))
    val sk = vals.toDF("v").agg(DdSketch.sketchAgg(col("v")))
      .head.getAs[Array[Byte]](0)
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val ests = qs.map(DdSketch.quantileOf(sk, _))
    assert(ests.sliding(2).forall { case Seq(x, y) => x <= y + 1e-12 })
  }

  test("out-of-range values clamp to edge buckets, count preserved") {
    val sk = Seq(1e-30, 1e40, 5.0).toDF("v")
      .agg(DdSketch.sketchAgg(col("v"))).head.getAs[Array[Byte]](0)
    assert(DdSketch.countAll(sk) == 3L)
  }

  test("native quantile/total expressions stay codegen'd in the plan") {
    val df = (1 to 100).map(i => (i % 5, i * 1.0)).toDF("g", "v")
      .groupBy(col("g")).agg(DdSketch.sketchAgg(col("v")).as("sk"))
      .select(col("g"), DdSketch.quantile(col("sk"), 0.95).as("p95"),
        DdSketch.total(col("sk")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), "expressions must codegen")
    val rows = df.collect()
    assert(rows.length == 5 && rows.forall(_.getLong(2) == 20L))
  }
}
