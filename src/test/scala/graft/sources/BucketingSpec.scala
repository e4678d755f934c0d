package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without any Exchange and results match") {
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    try {
      Tables.writeBucketed(left, "bspec_left", "k", numBuckets = 8)
      Tables.writeBucketed(right, "bspec_right", "k", numBuckets = 8)
      val l = spark.table("bspec_left")
      val r = spark.table("bspec_right")
      // SMJ must be the strategy under test (a broadcast join has no
      // exchange trivially) — disable auto-broadcast for the assertion
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = l.join(r, Seq("k"))
        val plan = joined.queryExecution.executedPlan.toString()
        assert(!plan.contains("Exchange"),
          s"bucketed join should be shuffle-free, got:\n$plan")
        assert(joined.count() == 500)
        assert(joined.filter($"k" === 7L).select("rv").as[Double].head() == 14.0)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_left")
      spark.sql("DROP TABLE IF EXISTS bspec_right")
    }
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    val df = (1 to 500).map(i => (i.toLong % 50, i * 1.0)).toDF("k", "v")
    try {
      Tables.writeBucketed(df, "bspec_agg", "k", numBuckets = 8)
      val agg = spark.table("bspec_agg").groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed groupBy should be shuffle-free, got:\n$plan")
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS bspec_agg")
  }
}
