package graft.ml

import graft.SparkSpec
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("EP1 pipeline end-to-end on sf0.001: metrics sane, artifacts persisted") {
    val out = Files.createTempDirectory("graft_pipeline").toString
    val report = Pipeline.trainOnTestdata(spark, "/root/testdata/sf0.001", out,
      grid = Seq(
        Als.Params(rank = 4, maxIter = 4, regParam = 0.1),
        Als.Params(rank = 4, maxIter = 4, regParam = 2.0)))
    assert(report.nRatings > 0 && report.nUsers > 0 && report.nItems > 0)
    assert(report.cv.length == 2)
    // the testdata ratings are structureless, so either grid point may
    // win CV — the contract is that the selected point is from the
    // grid with a finite average RMSE
    assert(report.cv.exists(_.params == report.best))
    assert(!report.cv.map(_.avgRmse).exists(_.isNaN))
    // structureless uniform ratings 1..10 have std ≈ 2.9; the model
    // can only match the noise floor, so the bands are sanity checks
    assert(report.trainRmse > 0 && report.trainRmse < 4.0)
    assert(report.testRmse > 0 && report.testRmse < 6.0)
    // persisted artifacts load back
    val model = Als.load(report.modelPath)
    assert(model.rank == 4)
    val users = spark.read.parquet(s"$out/user_mapping")
    assert(users.count() == report.nUsers)
    // dense 0-based ids
    import org.apache.spark.sql.functions._
    val mx = users.agg(min("u"), max("u")).head()
    assert(mx.getLong(0) == 0L && mx.getLong(1) == report.nUsers - 1)
  }
}
