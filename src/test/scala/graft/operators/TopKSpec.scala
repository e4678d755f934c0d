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

  test("dedupFirstSeen keeps the first row per (group, dup) by order") {
    val df = Seq((1, "a", 3), (1, "a", 1), (1, "b", 2), (2, "a", 5))
      .toDF("grp", "dup", "ord")
    val out = TopK.dedupFirstSeen(df, "grp", "dup", Seq($"ord"))
      .select("grp", "dup", "ord").as[(Int, String, Int)].collect().toSet
    assert(out == Set((1, "a", 1), (1, "b", 2), (2, "a", 5)))
  }
}
