package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest right row at-or-before each left time") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 10L, 200.0), (1L, 20L, 300.0),
      (2L, 9L, 400.0)).toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(200.0)) // equal time matches (inclusive)
    assert(out("b").contains(300.0)) // latest of the three priors
    assert(out("c").isEmpty)         // right row is in the future → null
  }

  test("asofJoin ignores null-time right rows and null-time left rows match nothing") {
    val left = Seq((1L, Some(10L), "a"), (1L, None, "b")).toDF("k", "t", "tag")
    val right = Seq((1L, Some(5L), 1.0), (1L, None, 99.0)).toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(1.0)) // the null-time 99.0 row never matches
    assert(out("b").isEmpty)       // null left time → no payload
  }

  test("asofJoin equals the brute-force max-subquery rewrite on random data") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 400).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    // unique (k, t) on the right, as the operator requires
    val right = (0 until 300).map(i => (i % 5L, (i * 7 + 3) % 997L, i.toLong))
      .distinct.toDF("k", "t", "rid")
    val fast = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("rid"))
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    val slow = left.as("l")
      .join(right.as("r"), $"l.k" === $"r.k" && $"r.t" <= $"l.t", "left")
      .groupBy($"l.lid")
      .agg(max(struct($"r.t", $"r.rid")).as("m"))
      .select($"lid", $"m.rid".as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == slow)
  }

  test("asofJoin plans one shuffle on the key, not a nested loop") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val plan = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
