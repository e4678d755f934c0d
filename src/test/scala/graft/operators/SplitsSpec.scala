package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  // Groups of size 1..12: group g has g rows.
  private def grouped = (1 to 12).flatMap(g => (0 until g).map(i => (g, i)))
    .toDF("grp", "v")

  test("leaveOneOut marks exactly one test row per group") {
    val out = Splits.leaveOneOut(grouped, "grp", seed = 42L)
    val per = out.groupBy("grp")
      .agg(sum(when($"is_test", 1).otherwise(0)).as("t"), count(lit(1)).as("n"))
      .as[(Int, Long, Long)].collect()
    assert(per.forall { case (g, t, n) => t == 1 && n == g })
  }

  test("holdoutN marks min(n, groupSize) test rows per group") {
    val out = Splits.holdoutN(grouped, "grp", n = 3, seed = 42L)
    val per = out.groupBy("grp")
      .agg(sum(when($"is_test", 1).otherwise(0)).as("t")).as[(Int, Long)].collect()
    assert(per.forall { case (g, t) => t == math.min(3, g) })
  }

  test("foldAssign partitions eligible groups into folds 0..k-1 and small groups to -1") {
    val k = 3; val minRows = 5
    val out = Splits.foldAssign(grouped, "grp", k, minRows, seed = 42L)
    val rows = out.select("grp", "fold").as[(Int, Int)].collect()
    rows.foreach { case (g, f) =>
      if (g < minRows) assert(f == -1, s"group $g")
      else assert(f >= 0 && f < k, s"group $g fold $f")
    }
    // fold sizes per eligible group: rn%k over 1..g gives balanced sizes
    val sizes = rows.filter(_._2 >= 0).groupBy(identity).view.mapValues(_.length)
    (minRows to 12).foreach { g =>
      val per = (0 until k).map(f => sizes.getOrElse((g, f), 0))
      assert(per.sum == g)
      assert(per.max - per.min <= 1)
    }
  }
}
