package graft.ml

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("rmseDf computes the exact RMSE") {
    // errors: 1, -1, 2, 0 → mse = 6/4 = 1.5 → rmse = 1.2247
    val df = Seq((1.0, 2.0), (3.0, 2.0), (0.0, 2.0), (5.0, 5.0))
      .toDF("label", "pred")
    val r = Eval.rmseDf(df, "label", "pred").as[Double].head()
    assert(r == math.floor(math.sqrt(1.5) * 10000) / 10000 ||
      math.abs(r - math.sqrt(1.5)) < 5e-5)
  }

  test("aucDf: perfect separation gives 1.0, anti-separation gives 0.0") {
    val perfect = Seq((0.0, 0.1), (0.0, 0.2), (1.0, 0.3), (1.0, 0.4))
      .toDF("label", "score")
    assert(Eval.aucDf(perfect, "label", "score").as[Double].head() == 1.0)
    val anti = Seq((1.0, 0.1), (1.0, 0.2), (0.0, 0.3), (0.0, 0.4))
      .toDF("label", "score")
    assert(Eval.aucDf(anti, "label", "score").as[Double].head() == 0.0)
  }

  test("aucDf handles ties with average ranks") {
    // scores (1,1,2,2), labels (0,1,0,1): rank-sum of positives =
    // 1.5 + 3.5 = 5 → AUC = (5 - 3)/4 = 0.5
    val df = Seq((0.0, 1.0), (1.0, 1.0), (0.0, 2.0), (1.0, 2.0))
      .toDF("label", "score")
    assert(Eval.aucDf(df, "label", "score").as[Double].head() == 0.5)
  }

  test("rocPoints endpoints and monotonicity") {
    val df = Seq((0.0, 1.0), (1.0, 2.0), (0.0, 3.0), (1.0, 4.0), (1.0, 5.0))
      .toDF("label", "score")
    val pts = Eval.rocPoints(df, "label", "score")
      .orderBy($"score".desc).as[(Double, Double, Double)].collect()
    // thresholds descending: tpr/fpr must be non-decreasing, ending at (1,1)
    assert(pts.last._2 == 1.0 && pts.last._3 == 1.0)
    val tprs = pts.map(_._3); val fprs = pts.map(_._2)
    assert(tprs.zip(tprs.tail).forall { case (a, b) => a <= b })
    assert(fprs.zip(fprs.tail).forall { case (a, b) => a <= b })
    // top threshold (score=5, a positive): tpr=1/3, fpr=0
    assert(pts.head._3 == math.rint(1.0 / 3.0 * 1e6) / 1e6 && pts.head._2 == 0.0)
  }

  test("aucDf binDigits: continuous scores collapse to a provably " +
    "bounded histogram; AUC moves by at most the bin width") {
    // 20k CONTINUOUS scores in [0, 2): distinct = rows without the
    // knob — exactly the case the corpus-scale contract forbids
    val n = 20000
    val df = (0 until n).map { i =>
      val score = (i * 2654435761L % 1000003).toDouble / 500001.5
      val label = if ((i * 40503L % 65536) < 32768 ^ score > 1.0) 1.0 else 0.0
      (label, score)
    }.toDF("label", "score")
    import org.apache.spark.sql.functions._
    // the window-input bound: binned distinct ≤ (max−min)·10^d + 1
    val binnedDistinct = df
      .select((floor(col("score") * 100.0) / 100.0).as("b"))
      .distinct().count()
    assert(binnedDistinct <= 201, s"bin bound violated: $binnedDistinct")
    assert(df.select(col("score")).distinct().count() > n / 2,
      "fixture is not continuous enough to exercise the contract")
    val full = Eval.aucDf(df, "label", "score").as[Double].head()
    val binned = Eval.aucDf(df, "label", "score", binDigits = Some(2))
      .as[Double].head()
    // ties are averaged, so coarsening perturbs AUC by ≤ the mass
    // within a bin; at 100 bins over a smooth score that is ≲ 0.01
    assert(math.abs(full - binned) < 0.01, s"full=$full binned=$binned")
  }

  test("calibrationBins: hand-computed reliability diagram; score 1.0 lands in the top bin") {
    // bin 0: p=0.05 ×2, one positive → conf .05, acc .5, gap .45
    // bin 9: p=0.95 and p=1.0 (edge: floor(1.0·10)=10 clamps to 9),
    //        both positive → conf .975, acc 1.0, gap .025
    val df = Seq(
      (1.0, 0.05), (0.0, 0.05), (1.0, 0.95), (1.0, 1.0)
    ).toDF("label", "score")
    val bins = Eval.calibrationBins(df, "label", "score")
      .orderBy("bin").collect()
    assert(bins.length == 2)
    val b0 = bins(0); val b9 = bins(1)
    assert(b0.getAs[Int]("bin") == 0 && b0.getAs[Long]("n") == 2L)
    assert(b0.getAs[Double]("conf") == 0.05 && b0.getAs[Double]("acc") == 0.5)
    assert(b0.getAs[Double]("gap") == 0.45)
    assert(b9.getAs[Int]("bin") == 9 && b9.getAs[Long]("n") == 2L)
    assert(b9.getAs[Double]("conf") == 0.975 && b9.getAs[Double]("acc") == 1.0)
    assert(b9.getAs[Double]("gap") == 0.025)
  }

  test("calibrationSummary: ECE/MCE/Brier match the hand computation; perfect calibration is 0") {
    val df = Seq(
      (1.0, 0.05), (0.0, 0.05), (1.0, 0.95), (1.0, 1.0)
    ).toDF("label", "score")
    val s = Eval.calibrationSummary(df, "label", "score").head()
    assert(s.getAs[Long]("n") == 4L)
    // ece = (2·0.45 + 2·0.025)/4 = 0.2375; mce = 0.45
    assert(s.getAs[Double]("ece") == 0.2375)
    assert(s.getAs[Double]("mce") == 0.45)
    // brier = ((0.95)² + (0.05)² + (0.05)² + 0²)/4 = 0.226875
    assert(math.abs(s.getAs[Double]("brier") - 0.226875) < 1e-9)
    // a perfectly calibrated degenerate scorer: p == empirical rate
    val perfect = Seq((1.0, 0.5), (0.0, 0.5)).toDF("label", "score")
    val p = Eval.calibrationSummary(perfect, "label", "score").head()
    assert(p.getAs[Double]("ece") == 0.0 && p.getAs[Double]("mce") == 0.0)
  }

  test("prPoints: hand-computed curve, recall monotone, precision exact " +
       "at each threshold") {
    // scores desc: 5(+) 4(+) 3(−) 2(+) 1(−)
    val df = Seq((0.0, 1.0), (1.0, 2.0), (0.0, 3.0), (1.0, 4.0), (1.0, 5.0))
      .toDF("label", "score")
    val pts = Eval.prPoints(df, "label", "score")
      .orderBy($"score".desc).as[(Double, Double, Double)].collect()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(pts.map(p => (p._1, p._2, p._3)).toSeq == Seq(
      (5.0, 1.0, r6(1.0 / 3)),        // ≥5: 1/1 precise, 1/3 recalled
      (4.0, 1.0, r6(2.0 / 3)),        // ≥4: 2/2, 2/3
      (3.0, r6(2.0 / 3), r6(2.0 / 3)),// ≥3: 2/3, 2/3
      (2.0, 0.75, 1.0),               // ≥2: 3/4, 3/3
      (1.0, 0.6, 1.0)))               // ≥1: 3/5, 3/3
    val recalls = pts.map(_._3)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
  }

  test("psiBins: identical snapshots give ~0 PSI; a shifted snapshot is " +
       "flagged; empty bins appear densely with smoothed shares") {
    val expected = Seq.tabulate(100)(i => i % 10 * 1.0).toDF("v") // uniform 0..9
    val same = Seq.tabulate(100)(i => i % 10 * 1.0).toDF("v")
    val zero = Eval.psiBins(expected, same, "v", lo = 0.0, hi = 10.0,
      nBins = 10).agg(org.apache.spark.sql.functions.sum("contrib"))
      .as[Double].head()
    assert(zero == 0.0, s"identical snapshots must have PSI 0, got $zero")

    // all mass shifted into the top half + out-of-range clamp into bin 9
    val shifted = Seq.tabulate(100)(i => 5.0 + i % 6 * 1.0).toDF("v")
    val bins = Eval.psiBins(expected, shifted, "v", lo = 0.0, hi = 10.0,
        nBins = 10).collect()
    assert(bins.length == 10, "dense bins: one row per bin")
    assert(bins.map(_.getAs[Int]("bin")).toSeq == (0 until 10))
    val psi = bins.map(_.getAs[Double]("contrib")).sum
    assert(psi > 0.25, s"a half-range shift is a major drift, got $psi")
    // empty actual bins (0–4) still carry smoothed nonzero shares
    val low = bins.filter(_.getAs[Int]("bin") < 5)
    assert(low.forall(r => r.getAs[Long]("n_actual") == 0L &&
      r.getAs[Double]("p_actual") > 0.0))
    // value 10.0 would clamp into bin 9 (hi is exclusive only by clamp)
    val clamp = Eval.psiBins(expected, Seq(10.0, 99.0, -5.0).toDF("v"),
        "v", lo = 0.0, hi = 10.0, nBins = 10).collect()
    assert(clamp.find(_.getAs[Int]("bin") == 9).get.getAs[Long]("n_actual") == 2L)
    assert(clamp.find(_.getAs[Int]("bin") == 0).get.getAs[Long]("n_actual") == 1L)
  }

  test("the distinct-score window guard warns on unbinned floating-point " +
       "scores and stays silent when binned or discrete") {
    val cont = Seq((1, 0.123), (0, 0.456), (1, 0.789)).toDF("label", "score")
    Eval.lastUnbinnedWarning = None
    Eval.aucDf(cont, "label", "score")
    assert(Eval.lastUnbinnedWarning.exists(_.contains("aucDf")),
      "unbinned double score must warn")
    Eval.lastUnbinnedWarning = None
    Eval.rocPoints(cont, "label", "score", binDigits = Some(2))
    assert(Eval.lastUnbinnedWarning.isEmpty, "binned call must not warn")
    Eval.prPoints(Seq((1, 3), (0, 2)).toDF("label", "score"),
      "label", "score")
    assert(Eval.lastUnbinnedWarning.isEmpty, "integer scores must not warn")
    Eval.prPoints(cont, "label", "score")
    assert(Eval.lastUnbinnedWarning.exists(_.contains("prPoints")),
      "unbinned continuous PR curve must warn")
    // warning is advisory only: binned and unbinned results agree on a
    // discrete-valued double column (q34/q211 oracles unchanged)
    val r1 = Eval.aucDf(cont, "label", "score").as[Double].head()
    val r2 = Eval.aucDf(cont, "label", "score", binDigits = Some(3))
      .as[Double].head()
    assert(r1 == r2)
    Eval.lastUnbinnedWarning = None
  }
}
