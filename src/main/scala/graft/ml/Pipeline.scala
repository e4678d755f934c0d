package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, IdMapping, Splits}
import graft.sources.Tables

/** The reference's full training entry point (EP1,
  * `ALS_model3.py:194-266`) as one composable, distributed pipeline:
  * clean → dense id-map → per-user CV over a grid → leave-one-out
  * split → final fit → train/test RMSE → persist model + mappings.
  *
  * Differences from the reference, by design (SURVEY §4):
  * id mapping is the scale-safe [[IdMapping.denseIds]] (not a global
  * window); nothing is ever collect()ed to the driver; metrics come
  * from [[Eval]] aggregations; persisted artifacts are parquet + the
  * standard ALSModel layout (S3/S4).
  */
object Pipeline {

  final case class TrainReport(
      nRatings: Long, nUsers: Long, nItems: Long,
      cv: Seq[Als.CvResult], best: Als.Params,
      trainRmse: Double, testRmse: Double,
      modelPath: String)

  /** Run the full EP1 pipeline over a raw ratings-shaped frame.
    * `grid` defaults to the reference's effective configuration (its
    * CV evaluated one point, then the script overrode the final params
    * — `ALS_model3.py:218`; here the grid is honest).
    */
  def train(raw: DataFrame,
            userCol: String, itemCol: String, ratingCol: String,
            outDir: String,
            grid: Seq[Als.Params] = Seq(Als.Params()),
            cvFolds: Int = 5, minRatings: Int = 7,
            seed: Long = 42L): TrainReport = {
    val clean = Cleaning.cleanRatings(raw, userCol, itemCol, ratingCol)
    // dense ordinal ids, attached without driver round-trips
    val users = IdMapping.denseIds(clean, "userId", "u")
    val items = IdMapping.denseIds(clean, "itemId", "i")
    val mapped = IdMapping.attach(
        IdMapping.attach(clean, users, "userId", "userId")
          .select(clean("itemId").as("itemId0"), col("rating"), col("u")),
        items.withColumnRenamed("itemId", "itemId1"), "itemId0", "itemId1")
      .select(col("u").as("userId"), col("i").as("itemId"), col("rating"))
      .cache()

    val nRatings = mapped.count()
    val nUsers = users.count()
    val nItems = items.count()

    val cv = Als.crossValidatePerUser(mapped, grid, cvFolds, minRatings, seed)
    val best = Als.selectBest(cv).params

    // leave-one-out final split (ALS_model3.py:222-225)
    val split = Splits.leaveOneOut(mapped, "userId", seed)
    val train = split.filter(!col("is_test")).drop("is_test")
    val test = split.filter(col("is_test")).drop("is_test")

    val model = Als.fit(train, best)
    val trainRmse = Eval.rmse(Als.predict(model, train), "rating", "prediction")
    val testRmse = Eval.rmse(
      Als.predict(model, test).na.drop(Seq("prediction")), "rating", "prediction")

    Tables.writeParquet(users, s"$outDir/user_mapping")
    Tables.writeParquet(items, s"$outDir/item_mapping")
    Als.save(model, s"$outDir/als_model")
    mapped.unpersist()

    TrainReport(nRatings, nUsers, nItems, cv, best, trainRmse, testRmse,
      s"$outDir/als_model")
  }

  /** Convenience: run EP1 over the testdata lineitem-shaped ratings. */
  def trainOnTestdata(spark: SparkSession, dir: String, outDir: String,
                      grid: Seq[Als.Params]): TrainReport =
    train(Tables.load(spark, dir, "lineitem"),
      "l_suppkey", "l_partkey", "l_quantity", outDir, grid)
}
