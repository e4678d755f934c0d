package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate is within 5% of the exact distinct count") {
    val n = 50000
    val df = (1 to n).map(i => s"user_$i").toDF("u")
    val est = df.agg(HllSketch.estimate(HllSketch.sketchAgg($"u")).as("d"))
      .as[Long].head()
    assert(math.abs(est - n).toDouble / n < 0.05, s"est=$est exact=$n")
  }

  test("linear-counting regime: small cardinalities are near-exact") {
    val df = (1 to 100).map(i => s"k$i").toDF("u")
    val est = df.agg(HllSketch.estimate(HllSketch.sketchAgg($"u")).as("d"))
      .as[Long].head()
    assert(math.abs(est - 100) <= 2, s"est=$est")
  }

  test("merge of partial sketches is BIT-IDENTICAL to the direct sketch") {
    val all = (1 to 20000).map(i => (i % 3, s"v$i")).toDF("part", "u")
    val direct = all.agg(HllSketch.sketchAgg($"u")).as[Array[Byte]].head()
    val merged = all.groupBy($"part")
      .agg(HllSketch.sketchAgg($"u").as("sk"))
      .agg(HllSketch.mergeAgg($"sk")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(direct, merged))
  }

  test("sketch bytes are partitioning-invariant (deterministic hash + max-merge)") {
    val df = (1 to 5000).map(i => s"x$i").toDF("u")
    val a = df.repartition(1).agg(HllSketch.sketchAgg($"u")).as[Array[Byte]].head()
    val b = df.repartition(17).agg(HllSketch.sketchAgg($"u")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(a, b))
  }

  test("sketch merge over a window gives rolling distinct within the error band") {
    // 10 days × users; user set shifts by 20 per day with 80 overlap
    val rows = (0 until 10).flatMap(d =>
      (d * 20 until d * 20 + 100).map(u => (d, s"u$u")))
      .toDF("day", "user")
    val daily = rows.groupBy($"day")
      .agg(HllSketch.sketchAgg($"user").as("sk"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"day").rowsBetween(-2, 0) // rolling 3 days
    val est = daily.select($"day",
      HllSketch.estimate(HllSketch.mergeAgg($"sk").over(w)).as("e"))
      .as[(Int, Long)].collect().toMap
    // exact rolling-3-day distinct: day d covers users (d-2)*20 .. d*20+99
    (2 until 10).foreach { d =>
      val exact = (d * 20 + 100) - (d - 2) * 20
      assert(math.abs(est(d) - exact).toDouble / exact < 0.05,
        s"day $d est=${est(d)} exact=$exact")
    }
  }

  test("duplicates do not move the estimate (distinct, not count)") {
    val once = (1 to 1000).map(i => s"d$i").toDF("u")
    val tenTimes = (1 to 10).flatMap(_ => (1 to 1000).map(i => s"d$i")).toDF("u")
    val e1 = once.agg(HllSketch.estimate(HllSketch.sketchAgg($"u"))).as[Long].head()
    val e2 = tenTimes.agg(HllSketch.estimate(HllSketch.sketchAgg($"u"))).as[Long].head()
    assert(e1 == e2)
  }
}
