package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("pointInInterval honors [start, end) bounds across bin edges") {
    // bin = 10s; interval straddles three bins
    val iv = Seq((1L, ts(5), ts(25), "w1")).toDF("k", "s", "e", "win")
    val pts = Seq((1L, ts(4), "before"), (1L, ts(5), "at-start"),
      (1L, ts(15), "mid"), (1L, ts(24), "last"), (1L, ts(25), "at-end"),
      (2L, ts(15), "other-key")).toDF("k", "t", "tag")
    val got = RangeJoin.pointInInterval(iv, pts, "k", "s", "e", "t",
      binSeconds = 10L).select("tag").as[String].collect().toSet
    assert(got == Set("at-start", "mid", "last")) // start in, end out, key respected
  }

  test("pointInInterval equals the raw non-equi join on random data, each pair once") {
    val rnd = new scala.util.Random(11)
    val iv = (0 until 120).map { i =>
      val s = rnd.nextInt(5000).toLong
      (rnd.nextInt(4).toLong, ts(s), ts(s + 1 + rnd.nextInt(400)), i.toLong)
    }.toDF("k", "s", "e", "win")
    val pts = (0 until 500).map(i =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(5600).toLong), i.toLong))
      .toDF("k", "t", "pid")
    val fast = RangeJoin.pointInInterval(iv, pts, "k", "s", "e", "t",
      binSeconds = 100L).select("win", "pid").as[(Long, Long)].collect()
    val slow = iv.as("i").join(pts.as("p"),
        $"i.k" === $"p.k" && $"p.t" >= $"i.s" && $"p.t" < $"i.e")
      .select($"win", $"pid").as[(Long, Long)].collect()
    assert(fast.length == fast.distinct.length) // exactly-once per pair
    assert(fast.sorted.toSeq == slow.sorted.toSeq)
  }

  test("pointInInterval plans an equi shuffle join, not a nested loop") {
    val iv = Seq((1L, ts(0), ts(10), 1L)).toDF("k", "s", "e", "win")
    val pts = (0 until 100).map(i => (1L, ts(i.toLong), i.toLong)).toDF("k", "t", "pid")
    val plan = RangeJoin.pointInInterval(iv, pts, "k", "s", "e", "t", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
