package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ALS fit/eval/serve/persist (M1–M8, S4). spark.ml ALS is not exactly
  * reproducible across versions, so assertions are ε-bands and
  * structural invariants, per SURVEY §7.4.
  */
class AlsSpec extends SparkSpec {
  import spark.implicits._

  // Low-rank synthetic ratings: block structure — users and items in
  // the same half like each other (rating 9) and dislike the other
  // half (rating 2). 40 users × 30 items, ~75% observed.
  private lazy val ratings = {
    val rows = for {
      u <- 0 until 40
      i <- 0 until 30
      if (u * 31 + i * 17) % 4 != 0
    } yield (u.toLong, i.toLong, if ((u < 20) == (i < 15)) 9 else 2)
    rows.toDF("userId", "itemId", "rating").cache()
  }

  private lazy val model =
    Als.fit(ratings, Als.Params(rank = 4, maxIter = 8, regParam = 0.1, seed = 42L))

  test("fit + predict recovers the block structure (train RMSE small)") {
    val pred = Als.predict(model, ratings)
    val rmse = Eval.rmse(pred, "rating", "prediction")
    assert(rmse < 1.0, s"train rmse $rmse")
  }

  test("recommendSubset returns exactly k ranked recs per requested user") {
    val users = Seq(0L, 1L, 25L).toDF("userId")
    val recs = Als.explodeRecs(Als.recommendSubset(model, users, 5))
    val per = recs.groupBy("userId").agg(count(lit(1)).as("n"), max("rank").as("mr"))
      .as[(Int, Long, Int)].collect()
    assert(per.length == 3 && per.forall { case (_, n, mr) => n == 5 && mr == 5 })
    // block structure: user 0 (first half) should rank first-half items on top
    val top1 = recs.filter($"userId" === 0 && $"rank" === 1)
      .select("itemId").as[Int].head()
    assert(top1 < 15, s"user 0 top rec $top1 should be a first-half item")
  }

  test("save/load roundtrip preserves predictions (S4)") {
    val dir = Files.createTempDirectory("als_model").toString
    Als.save(model, dir)
    val re = Als.load(dir)
    val a = Als.predict(model, ratings).orderBy("userId", "itemId")
      .select("prediction").as[Float].collect()
    val b = Als.predict(re, ratings).orderBy("userId", "itemId")
      .select("prediction").as[Float].collect()
    assert(a.sameElements(b))
  }

  test("per-user CV produces per-fold RMSEs in a sane band and selectBest picks the min") {
    val grid = Seq(
      Als.Params(rank = 4, maxIter = 6, regParam = 0.1, seed = 42L),
      Als.Params(rank = 2, maxIter = 2, regParam = 5.0, seed = 42L))
    val results = Als.crossValidatePerUser(ratings, grid, k = 3, minRatings = 5)
    assert(results.length == 2)
    results.foreach { r => assert(r.foldRmses.nonEmpty && r.foldRmses.forall(x => x > 0 && x < 10)) }
    // the heavily-regularized 2-iteration point must be worse
    val best = Als.selectBest(results)
    assert(best.params == grid.head)
    assert(best.avgRmse < results(1).avgRmse)
    assert(best.avgRmse < 2.5, s"cv rmse ${best.avgRmse}")
  }

  test("stock CrossValidator path returns a usable best model (M7)") {
    val m = Als.mllibCrossValidate(ratings, ranks = Seq(2, 4),
      regParams = Seq(0.1), maxIter = 4, numFolds = 2)
    val rmse = Eval.rmse(m.transform(
      ratings.select($"userId".cast("int").as("userId"),
        $"itemId".cast("int").as("itemId"),
        $"rating".cast("float").as("rating"))), "rating", "prediction")
    assert(rmse < 2.0, s"cv best-model rmse $rmse")
  }
}
