package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ServeSpec extends SparkSpec {
  import spark.implicits._

  test("wide pivots ranks into exactly k item columns") {
    val ranked = Seq((1, 10, 1), (1, 11, 2), (2, 20, 1))
      .toDF("userId", "itemId", "rank")
    val w = Serve.wide(ranked, k = 3)
    assert(w.columns.toSeq == Seq("userId", "item_1", "item_2", "item_3"))
    val rows = w.orderBy("userId").collect()
    assert(rows(0).getInt(1) == 10 && rows(0).getInt(2) == 11 && rows(0).isNullAt(3))
    assert(rows(1).getInt(1) == 20 && rows(1).isNullAt(2))
  }

  test("withTitles broadcast-joins the dim and keeps rank") {
    val recs = Seq((1, 10, 1), (1, 11, 2)).toDF("userId", "itemId", "rank")
    val titles = Seq((10, "A"), (11, "B"), (12, "C")).toDF("id", "name")
    val out = Serve.withTitles(recs, titles, "id", "name")
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(out.orderBy("rank").select("title").as[String].collect().toSeq == Seq("A", "B"))
  }

  test("topKWithFallback serves exactly k items per user even for cold users") {
    val ratings = (for { u <- 0 until 15; i <- 0 until 10 if (u + i) % 3 != 0 }
      yield (u.toLong, i.toLong, ((u * i) % 9 + 1))).toDF("userId", "itemId", "rating")
    val model = Als.fit(ratings, Als.Params(rank = 2, maxIter = 3, regParam = 0.1))
    // user 99 has no ratings at all → pure fallback
    val users = Seq(0L, 1L, 99L).toDF("userId")
    val out = Serve.topKWithFallback(model, users, ratings, k = 4, poolSize = 10)
    val per = out.groupBy("userId").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    assert(per.keySet == Set(0, 1, 99) && per.values.forall(_ == 4L))
  }
}
