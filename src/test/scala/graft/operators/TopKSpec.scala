package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("perGroup returns k rows per group ranked by order") {
    val df = (1 to 4).flatMap(g => (1 to 10).map(i => (g, i * g)))
      .toDF("grp", "score")
    val out = TopK.perGroup(df, "grp", Seq($"score".desc), k = 3)
    val per = out.groupBy("grp").agg(count(lit(1)).as("n"), max("rank").as("mr"))
      .as[(Int, Long, Int)].collect()
    assert(per.forall { case (_, n, mr) => n == 3 && mr == 3 })
    val top1 = out.filter($"rank" === 1).select("grp", "score")
      .as[(Int, Int)].collect().toMap
    assert((1 to 4).forall(g => top1(g) == 10 * g))
  }

  test("fillToK pads each group to exactly k with primary-wins") {
    // user 1: 2 primary; user 2: 0 primary; fallback pool of 5 items.
    val primary = Seq((1, 101, 9.0), (1, 102, 8.0)).toDF("u", "item", "score")
    val fallback = (1 to 2).flatMap(u =>
      Seq((u, 101, 5.0), (u, 201, 4.0), (u, 202, 3.0), (u, 203, 2.0), (u, 204, 1.0)))
      .toDF("u", "item", "score")
    val out = TopK.fillToK(primary, fallback, "u", "item", "score", k = 4)
    val per = out.groupBy("u").agg(count(lit(1)).as("n")).as[(Int, Long)].collect().toMap
    assert(per(1) == 4 && per(2) == 4)
    // primary items rank first for user 1; fallback item 101 (dup of a
    // primary item) must not appear twice
    val u1 = out.filter($"u" === 1).orderBy("rank").select("item")
      .as[Int].collect().toSeq
    assert(u1 == Seq(101, 102, 201, 202))
    val u2 = out.filter($"u" === 2).orderBy("rank").select("item")
      .as[Int].collect().toSeq
    assert(u2 == Seq(101, 201, 202, 203))
  }

  test("TopKAgg.perGroup matches the window top-k row-for-row (ties included)") {
    val rng = new scala.util.Random(5)
    val df = (1 to 2000).map(_ => (rng.nextInt(20).toLong,
      rng.nextInt(1000).toLong, rng.nextInt(50).toDouble))
      .toDF("g", "id", "score")
    val win = TopK.perGroup(df, "g", Seq($"score".desc, $"id"), k = 5)
      .select($"g", $"rank", $"id", $"score")
    val agg = TopKAgg.perGroup(df, "g", "score", "id", k = 5)
      .select($"g", $"rank", $"id", $"score")
    assert(win.count() == agg.count())
    assert(win.exceptAll(agg).isEmpty && agg.exceptAll(win).isEmpty)
  }

  test("TopKAgg.perGroup matches the window on NaN scores (NaN ranks largest, never evicts silently)") {
    // group 1: NaN + real scores — Spark's double ordering puts NaN
    // FIRST under desc; group 2: all-NaN (ties broken by id asc);
    // k=2 forces eviction decisions involving NaN
    val df = Seq(
      (1L, 10L, 1.0), (1L, 11L, Double.NaN), (1L, 12L, 5.0), (1L, 13L, 3.0),
      (2L, 20L, Double.NaN), (2L, 21L, Double.NaN), (2L, 22L, Double.NaN))
      .toDF("g", "id", "score")
    val win = TopK.perGroup(df, "g", Seq($"score".desc, $"id"), k = 2)
      .select($"g", $"rank", $"id", $"score")
    val agg = TopKAgg.perGroup(df, "g", "score", "id", k = 2)
      .select($"g", $"rank", $"id", $"score")
    assert(win.exceptAll(agg).isEmpty && agg.exceptAll(win).isEmpty)
    // explicit pin, independent of the window: NaN first, then 5.0
    assert(agg.filter($"g" === 1).orderBy("rank").select("id")
      .as[Long].collect().toSeq == Seq(11L, 12L))
    assert(agg.filter($"g" === 2).orderBy("rank").select("id")
      .as[Long].collect().toSeq == Seq(20L, 21L))
  }

  test("TopKPairsBuffer grows lazily and stays correct across serialize/merge") {
    val b = new graft.functions.TopKPairsBuffer(100)
    assert(b.scores.length == 8) // lazy initial allocation, not k
    val rng = new scala.util.Random(7)
    val items = (1 to 60).map(i => (rng.nextDouble(), i.toLong))
    items.foreach { case (s, id) => b.insert(s, id) }
    assert(b.n == 60 && b.scores.length >= 60 && b.scores.length <= 100)
    val expected = items.sortBy { case (s, id) => (-s, id) }
    assert((0 until 60).forall(i =>
      b.scores(i) == expected(i)._1 && b.ids(i) == expected(i)._2))
    // -0.0 ties 0.0 (id breaks the tie), matching Spark's ordering
    val z = new graft.functions.TopKPairsBuffer(2)
    z.insert(0.0, 5L); z.insert(-0.0, 3L); z.insert(-1.0, 1L)
    assert(z.ids.take(2).toSeq == Seq(3L, 5L))
  }

  test("dedupFirstSeen keeps the first row per (group, dup) by order") {
    val df = Seq((1, "a", 3), (1, "a", 1), (1, "b", 2), (2, "a", 5))
      .toDF("grp", "dup", "ord")
    val out = TopK.dedupFirstSeen(df, "grp", "dup", Seq($"ord"))
      .select("grp", "dup", "ord").as[(Int, String, Int)].collect().toSet
    assert(out == Set((1, "a", 1), (1, "b", 2), (2, "a", 5)))
  }
}
