package graft.operators

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("check reports pass/fail with observed values, one shared pass") {
    val df = Seq(
      (1L, Some(10.0)), (2L, Some(20.0)), (2L, None), (3L, Some(9999.0)))
      .toDF("k", "v")
    val out = Constraints.check(df, Seq(
      Constraints.unique("k"),           // 3 distinct / 4 rows → fail
      Constraints.nullRate("v", 0.30),   // 1/4 = 0.25 → pass
      Constraints.inRange("v", 0, 100))) // 9999 violates → fail
      .as[(String, Boolean, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("unique(k)") == ((false, 0.75)))
    assert(out("null_rate(v) <= 0.3") == ((true, 0.25)))
    assert(out("in_range(v, 0.0, 100.0)") == ((false, 1.0)))
  }

  test("referential counts orphans, ignores null FKs") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Constraints.referential(child, "fk", parent, "pk")
      .as[(String, Boolean, Double)].head()
    assert(!r._2 && r._3 == 1.0)
  }
}
