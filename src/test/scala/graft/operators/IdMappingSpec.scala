package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IdMappingSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int) =
    (0 until n).map(i => ((i * 7919) % 1000).toLong).toDF("k")

  test("denseIds agrees with strictOrdinal row-for-row") {
    val df = keys(5000)
    val dense = IdMapping.denseIds(df, "k", "id").orderBy("k")
      .as[(Long, Long)].collect()
    val strict = IdMapping.strictOrdinal(df, "k", "id").orderBy("k")
      .as[(Long, Long)].collect()
    assert(dense.sameElements(strict))
  }

  test("denseIds agrees with strictOrdinal under explicit partition counts") {
    val df = keys(3000)
    for (p <- Seq(1, 3, 16)) {
      val dense = IdMapping.denseIds(df, "k", "id", Some(p)).orderBy("k")
        .as[(Long, Long)].collect()
      val strict = IdMapping.strictOrdinal(df, "k", "id").orderBy("k")
        .as[(Long, Long)].collect()
      assert(dense.sameElements(strict), s"partitions=$p")
    }
  }

  test("denseIds is dense, 0-based, and drops nulls") {
    val df = Seq(Some(5L), None, Some(2L), Some(5L), Some(9L))
      .toDF("k")
    val m = IdMapping.denseIds(df, "k", "id").orderBy("id")
      .as[(Long, Long)].collect()
    assert(m.toSeq == Seq((2L, 0L), (5L, 1L), (9L, 2L)))
  }

  test("attach broadcasts small mappings and not large-threshold-exceeded ones") {
    val fact = (0 until 100).map(i => (i.toLong % 10, i)).toDF("fk", "v")
    val mapping = (0L until 10L).map(k => (k, k * 100)).toDF("mk", "id")
    val small = IdMapping.attach(fact, mapping, "fk", "mk")
    assert(small.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val gated = IdMapping.attach(fact, mapping, "fk", "mk", broadcastThreshold = 0L)
    // With the hint suppressed the planner may still choose broadcast on
    // its own stats — the contract is only that WE did not force it.
    assert(gated.count() == 100)
    assert(small.count() == 100)
  }
}
