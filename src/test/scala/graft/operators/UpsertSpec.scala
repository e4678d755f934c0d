package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("latestWins keeps the highest version per key and passes unchanged rows through") {
    val rows = Seq(
      (1L, "a", 0L), (1L, "b", 2L), (1L, "c", 1L), // key 1: version 2 wins
      (2L, "x", 0L),                               // key 2: untouched
      (3L, "y", 5L), (3L, "z", 4L)).toDF("k", "payload", "version")
    val out = Upsert.latestWins(rows, Seq("k"), "version")
      .as[(Long, Long, String)].collect().toSet // select order: k, version, payload
    assert(out == Set((1L, 2L, "b"), (2L, 0L, "x"), (3L, 5L, "y")))
  }

  test("latestWins plans partial aggregation before the shuffle, no window sort") {
    val rows = Seq((1L, "a", 0L)).toDF("k", "payload", "version")
    val plan = Upsert.latestWins(rows, Seq("k"), "version")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      plan.take(1500))
  }
}
