package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}

/** Model-evaluation metrics (SURVEY M5, M6, M10) as plain deterministic
  * DataFrame aggregations.
  *
  * The reference reaches for `RegressionEvaluator` /
  * `BinaryClassificationEvaluator` / sklearn `roc_curve`
  * (`ALS_model3.py:114`, `Model_evaluation.py:75-107`). Those are fine
  * for fitting loops (see [[Als]]), but as *query operators* they are
  * re-expressed here as aggregations so that (a) results are
  * bit-deterministic under any partitioning and (b) a SQL oracle can
  * check them. Scale notes per op below.
  */
object Eval {

  private val D8 = DecimalType(18, 8)

  private val logger = org.slf4j.LoggerFactory.getLogger("graft.ml.Eval")

  /** Last warning emitted by [[warnIfContinuousUnbinned]] — a testable
    * hook (EvalSpec pins that the guard fires) beside the log line.
    */
  @volatile private[graft] var lastUnbinnedWarning: Option[String] = None

  /** The distinct-score histogram family ([[aucDf]] / [[rocPoints]] /
    * [[prPoints]]) runs a PARTITIONLESS window whose input size is the
    * score cardinality. On a floating-point score column with no
    * `binDigits`, distinct ≈ rows and that window funnels the whole
    * eval set through one task — fine for bounded eval sets, a funnel
    * at corpus scale. Warn loudly (with the bound that would fix it)
    * instead of silently building the unbounded plan; results are
    * unchanged, so every existing oracle stays green.
    */
  private def warnIfContinuousUnbinned(df: DataFrame, scoreCol: String,
                                       binDigits: Option[Int],
                                       op: String): Unit =
    if (binDigits.isEmpty) df.schema(scoreCol).dataType match {
      case FloatType | DoubleType =>
        val msg = s"$op: score column '$scoreCol' is floating-point and " +
          "binDigits is None — the distinct-score window is bounded only " +
          "by score cardinality (eval-set-sized for continuous scores). " +
          "Pass binDigits = Some(d) to bound it to (max-min)*10^d + 1 rows " +
          "at <= one bin width of metric perturbation."
        lastUnbinnedWarning = Some(msg)
        logger.warn(msg)
      case _ => ()
    }

  /** RMSE as a 1-row DataFrame, deterministic: the squared error is
    * accumulated EXACTLY in decimal (inputs are ≤4-fractional-digit
    * predictions against integer labels), only the final sqrt runs in
    * double. Same op shape as the SQL
    * `ROUND(SQRT(CAST(SUM(CAST(d AS DECIMAL(18,8)) * d AS DOUBLE))/COUNT(*)),4)`.
    * One shuffle-free partial agg + 1-row merge; scale-trivial.
    */
  def rmseDf(df: DataFrame, labelCol: String, predCol: String,
             digits: Int = 4): DataFrame = {
    val d = (col(predCol) - col(labelCol)).cast(D8)
    df.agg(
      round(sqrt(sum(d * d).cast("double") / count(lit(1))), digits)
        .as("rmse"))
  }

  /** Scalar RMSE for fitting loops (M5 parity — same value spark.ml's
    * RegressionEvaluator computes, without instantiating one).
    */
  def rmse(df: DataFrame, labelCol: String, predCol: String): Double =
    df.agg(sqrt(avg(pow(col(predCol) - col(labelCol), 2.0))))
      .head().getDouble(0)

  /** Decimal-floor binning: `⌊score·10^d⌋ / 10^d`. Floor (not round)
    * is deliberate — it is exact on doubles and identical in every
    * engine, whereas decimal rounding of a double differs between
    * Spark (BigDecimal HALF_UP on the decimal string) and C-family
    * engines near .5 boundaries, which would move whole histogram
    * rows in an oracle replay. The multiply stays exact while
    * |score·10^d| < 2^53 (any practical score scale).
    */
  private def binned(c: Column, binDigits: Option[Int]): Column =
    binDigits.map { d =>
      val p = math.pow(10.0, d)
      floor(c * lit(p)) / lit(p)
    }.getOrElse(c)

  /** Binary AUC-ROC via the Mann–Whitney rank-sum, computed over the
    * per-distinct-score histogram (M6): group by score →
    * (n, positives), cumulative count of strictly-lower scores via a
    * window over DISTINCT SCORES. Tie handling = average rank,
    * identical to sklearn/spark.ml. All intermediate values are
    * half-integers — exact in double, so the result is
    * partitioning-independent.
    *
    * SCALE CONTRACT — the partitionless window: its input is the
    * distinct-score histogram, so its size is the SCORE CARDINALITY,
    * not the row count. For discrete/rounded scores that is a
    * histogram; for a CONTINUOUS score column (raw float model
    * outputs) distinct ≈ rows and the single window partition becomes
    * eval-set-sized — acceptable for bounded eval sets (the same
    * boundary as driver-side sklearn), NOT for corpus-scale scoring.
    * Corpus-scale callers set `binDigits = Some(d)`: scores are
    * decimal-floor binned to d fractional digits FIRST, provably
    * bounding the window input to ≤ (max−min)·10^d + 1 rows at an AUC
    * perturbation ≤ the bin width. (With ties averaged, binning is
    * exactly AUC over the coarsened score.)
    */
  def aucDf(df: DataFrame, labelCol: String, scoreCol: String,
            digits: Int = 6, binDigits: Option[Int] = None): DataFrame = {
    warnIfContinuousUnbinned(df, scoreCol, binDigits, "aucDf")
    // null scores carry no defined AUC semantics and sort differently
    // across engines (Spark windows: NULLS FIRST; DuckDB: NULLS LAST)
    // — drop them before the histogram so results cannot diverge
    val g = df.filter(col(scoreCol).isNotNull)
      .groupBy(binned(col(scoreCol), binDigits).as(scoreCol)).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col(labelCol).cast("double")).as("pos"))
    val before = Window.orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum_before", coalesce(sum(col("n")).over(before), lit(0.0)))
      .withColumn("rs", col("pos") * (col("cum_before") + (col("n") + 1.0) / 2.0))
      .agg(round(
        (sum(col("rs")) - sum(col("pos")) * (sum(col("pos")) + 1.0) / 2.0) /
          (sum(col("pos")) * (sum(col("n")) - sum(col("pos")))),
        digits).as("auc"))
  }

  /** Reliability diagram for a probability-scored binary frame — the
    * calibration face of the eval family (a quality-model score used
    * as a KEEP probability must be calibrated before it gates a
    * corpus; cf. the L30 quality model): fixed-width bins over [0,1]
    * (`bin = min(⌊p·nBins⌋, nBins−1)`), one row per non-empty bin with
    * `(bin, p_lo, n, conf, acc, gap)` — mean predicted probability,
    * empirical positive rate, and |acc − conf|.
    *
    * Determinism: per-bin score mass accumulates in DECIMAL (exact,
    * partitioning-independent — the [[rmseDf]] discipline); the only
    * doubles are final divisions, which IEEE fixes bit-identically in
    * every engine. Scale: ONE map-side-combinable aggregation into
    * ≤ nBins groups; nothing downstream exceeds nBins rows.
    */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
                      nBins: Int = 10, digits: Int = 6): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    df.filter(col(scoreCol).isNotNull)
      .groupBy(least(floor(col(scoreCol) * nBins), lit(nBins - 1))
        .cast("int").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(scoreCol).cast(D8)).as("_s"),
        sum(col(labelCol).cast("double")).as("_pos"))
      .select(
        col("bin"),
        round(col("bin").cast("double") / nBins, digits).as("p_lo"),
        col("n"),
        round(col("_s").cast("double") / col("n"), digits).as("conf"),
        round(col("_pos") / col("n"), digits).as("acc"),
        round(abs(col("_pos") / col("n") -
          col("_s").cast("double") / col("n")), digits).as("gap"))
  }

  /** Scalar calibration metrics over the same binning as
    * [[calibrationBins]]: expected calibration error (bin-mass-
    * weighted |acc − conf|), maximum calibration error, and the
    * binning-free Brier score — as a 1-row frame
    * `(n, ece, mce, brier)`. Same decimal-accumulation determinism
    * and ≤ nBins intermediate rows as the bins frame.
    */
  def calibrationSummary(df: DataFrame, labelCol: String, scoreCol: String,
                         nBins: Int = 10, digits: Int = 6): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val d = (col(scoreCol).cast(D8) - col(labelCol).cast(D8))
    val bins = df.filter(col(scoreCol).isNotNull)
      .groupBy(least(floor(col(scoreCol) * nBins), lit(nBins - 1))
        .cast("int").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(scoreCol).cast(D8)).as("_s"),
        sum(col(labelCol).cast("double")).as("_pos"),
        sum(d * d).as("_sq"))
      .withColumn("_gap",
        abs(col("_pos") / col("n") - col("_s").cast("double") / col("n")))
    bins.agg(
      sum(col("n")).as("n"),
      round(sum(col("_gap") * col("n")) / sum(col("n")), digits).as("ece"),
      round(max(col("_gap")), digits).as("mce"),
      round(sum(col("_sq")).cast("double") / sum(col("n")), digits)
        .as("brier"))
  }

  /** ROC curve points (M10; replaces the reference's sklearn/matplotlib
    * PNG, `Model_evaluation.py:95-107`, with the S7 table the survey
    * prescribes): one (score, fpr, tpr) row per distinct score,
    * thresholds descending — "predict positive when score ≥ s".
    * Same distinct-score histogram shape — and the same continuous-
    * score contract and `binDigits` bound — as [[aucDf]] (a binned
    * curve is the exact ROC of the coarsened score; one point per
    * bin).
    */
  def rocPoints(df: DataFrame, labelCol: String, scoreCol: String,
                digits: Int = 6, binDigits: Option[Int] = None): DataFrame = {
    warnIfContinuousUnbinned(df, scoreCol, binDigits, "rocPoints")
    // same null-score drop as [[aucDf]] (threshold semantics undefined)
    val g = df.filter(col(scoreCol).isNotNull)
      .groupBy(binned(col(scoreCol), binDigits).as(scoreCol)).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col(labelCol).cast("double")).as("pos"))
    val cum = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = g.agg(sum(col("pos")).as("tot_pos"), sum(col("n")).as("tot_n"))
    g.withColumn("cum_pos", sum(col("pos")).over(cum))
      .withColumn("cum_n", sum(col("n")).over(cum))
      .crossJoin(broadcast(tot))
      .select(
        col(scoreCol),
        round((col("cum_n") - col("cum_pos")) / (col("tot_n") - col("tot_pos")),
          digits).as("fpr"),
        round(col("cum_pos") / col("tot_pos"), digits).as("tpr"))
  }

  /** Precision–recall curve points — the companion of [[rocPoints]]
    * for the IMBALANCED labels a corpus quality gate actually has
    * (keep-worthy docs are the minority class; ROC's fpr axis hides
    * precision collapse there): one
    * `(score, precision, recall)` row per distinct (or binned) score,
    * thresholds descending, "predict positive when score ≥ s".
    * Identical histogram shape, null-score drop, continuous-score
    * `binDigits` bound, and half-integer-exact cumulative arithmetic
    * as [[rocPoints]].
    */
  def prPoints(df: DataFrame, labelCol: String, scoreCol: String,
               digits: Int = 6, binDigits: Option[Int] = None): DataFrame = {
    warnIfContinuousUnbinned(df, scoreCol, binDigits, "prPoints")
    val g = df.filter(col(scoreCol).isNotNull)
      .groupBy(binned(col(scoreCol), binDigits).as(scoreCol)).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col(labelCol).cast("double")).as("pos"))
    val cum = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = g.agg(sum(col("pos")).as("tot_pos"))
    g.withColumn("cum_pos", sum(col("pos")).over(cum))
      .withColumn("cum_n", sum(col("n")).over(cum))
      .crossJoin(broadcast(tot))
      .select(
        col(scoreCol),
        round(col("cum_pos") / col("cum_n"), digits).as("precision"),
        round(col("cum_pos") / col("tot_pos"), digits).as("recall"))
  }

  /** Population stability index between two snapshots of a value
    * column — the drift monitor a periodically-rebuilt corpus (or a
    * quality-score distribution) needs: fixed-width bins over
    * `[lo, hi)` (out-of-range values clamp into the edge bins, so the
    * index also SEES range drift), per-bin shares with add-half
    * smoothing (`(n + 0.5) / (N + nBins/2)` — no magic epsilon, empty
    * bins stay finite), `contrib = (p_a − p_e)·ln(p_a/p_e)`, PSI =
    * Σ contrib. The usual reading: < 0.1 stable, 0.1–0.25 moderate,
    * > 0.25 major shift.
    *
    * Output: one row per bin 0..nBins−1 (dense — empty bins included,
    * they carry drift signal): `(bin, lo_edge, n_expected, n_actual,
    * p_expected, p_actual, contrib)`.
    *
    * Determinism: shares and ln run in double over integer counts —
    * IEEE-identical in any engine (the q75 tf-idf ln precedent);
    * rounded once at the output face. Scale: two map-side-combinable
    * ≤ nBins aggregations joined on the bin id; nothing exceeds nBins
    * rows after the scans.
    */
  def psiBins(expected: DataFrame, actual: DataFrame, valueCol: String,
              lo: Double, hi: Double, nBins: Int = 10,
              digits: Int = 6): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val width = (hi - lo) / nBins
    def binOf(c: Column): Column =
      least(greatest(floor((c - lo) / width), lit(0.0)), lit(nBins - 1.0))
        .cast("int")
    def counts(df: DataFrame, as: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .groupBy(binOf(col(valueCol)).as("bin"))
        .agg(count(lit(1)).as(as))
    val bins = expected.sparkSession.range(nBins)
      .select(col("id").cast("int").as("bin"))
    val half = lit(0.5)
    bins
      .join(counts(expected, "n_expected"), Seq("bin"), "left")
      .join(counts(actual, "n_actual"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_expected", "n_actual"))
      .crossJoin(broadcast(
        expected.filter(col(valueCol).isNotNull)
          .agg(count(lit(1)).as("_te"))
          .crossJoin(actual.filter(col(valueCol).isNotNull)
            .agg(count(lit(1)).as("_ta")))))
      .withColumn("p_expected",
        (col("n_expected") + half) / (col("_te") + lit(0.5 * nBins)))
      .withColumn("p_actual",
        (col("n_actual") + half) / (col("_ta") + lit(0.5 * nBins)))
      .select(
        col("bin"),
        round(lit(lo) + col("bin") * width, digits).as("lo_edge"),
        col("n_expected"), col("n_actual"),
        round(col("p_expected"), digits).as("p_expected"),
        round(col("p_actual"), digits).as("p_actual"),
        round((col("p_actual") - col("p_expected")) *
          log(col("p_actual") / col("p_expected")), digits).as("contrib"))
      .orderBy(col("bin"))
  }
}
