package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Supervised feature engineering and experiment statistics.
  *
  * Both operators follow the [[graft.functions.Det]] discipline: every
  * distributed aggregation runs exactly (integer or decimal sums), and
  * floating point only appears in per-row/per-group scalar expressions
  * with a fixed operation order — so results are bit-reproducible
  * across partitionings and replayable by an external SQL engine.
  */
object Features {

  /** Leave-one-out target encoding: each row's category is encoded as
    * the mean target of OTHER rows in the category,
    * `(Σ target − target) / (n − 1)` — the standard leakage-free mean
    * encoding for supervised training (plain mean encoding leaks each
    * row's own label into its feature). Singleton categories encode
    * NULL. One hash aggregation on the category plus a broadcast-sized
    * join back; the fact stream never shuffles twice.
    */
  def looTargetEncode(df: DataFrame, catCol: String, targetCol: Column,
                      outCol: String = "enc", digits: Int = 6): DataFrame = {
    val t = targetCol.cast("long")
    val stats = df.groupBy(col(catCol))
      .agg(sum(t).as("_sum_t"), count(lit(1)).as("_n_t"))
    // LEFT join: rows with a NULL category can't equi-match their own
    // stats row, and must pass through with a NULL encoding rather
    // than vanish from the output (an inner join changes row count for
    // nullable categorical inputs).
    df.join(stats, Seq(catCol), "left")
      .withColumn(outCol,
        when(col("_n_t") > 1,
          round((col("_sum_t") - t).cast("double") / (col("_n_t") - 1), digits)))
      .drop("_sum_t", "_n_t")
  }

  /** CUPED variance reduction for experiment metrics: the adjusted
    * metric `y − θ(x − x̄)` with `θ = cov(x,y)/var(x)` estimated from
    * the data, where `x` is a pre-experiment covariate of the same
    * unit. Reports, per group, θ and the variance before/after —
    * the sample-size-multiplier readout every A/B platform shows.
    * All moments are exact decimal sums (one aggregation pass, two
    * shuffles total incl. the unit rollup); θ and the variances are
    * closed-form scalar doubles. Inputs must carry ≤2 fractional
    * digits. Output: `(grp, n_units, theta, var_y, var_adj,
    * reduction)`.
    *
    * Determinism note: var_adj expands algebraically to
    * `var(y) − cov²/var(x)` — computing it from the MOMENTS rather
    * than re-aggregating adjusted rows keeps the whole result a
    * scalar function of the exact sums.
    */
  def cuped(units: DataFrame, groupCol: String, preCol: String,
            postCol: String, digits: Int = 6): DataFrame = {
    val xd = col(preCol).cast(DecimalType(18, 2))
    val yd = col(postCol).cast(DecimalType(18, 2))
    val m = units.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_units"),
        sum(xd).cast("double").as("sx"),
        sum(yd).cast("double").as("sy"),
        sum(xd * xd).cast("double").as("sxx"),
        sum(yd * yd).cast("double").as("syy"),
        sum(xd * yd).cast("double").as("sxy"))
      .withColumn("nd", col("n_units").cast("double"))
      // central moments from raw sums; sample (n-1) normalization
      .withColumn("vx",
        (col("sxx") - col("sx") * col("sx") / col("nd")) / (col("nd") - 1))
      .withColumn("vy",
        (col("syy") - col("sy") * col("sy") / col("nd")) / (col("nd") - 1))
      .withColumn("cxy",
        (col("sxy") - col("sx") * col("sy") / col("nd")) / (col("nd") - 1))
    // vx = 0 (all-constant covariate) leaves θ undefined: Spark's
    // non-ANSI x/0 gives NULL but DuckDB gives Inf/NaN, so guard the
    // divisors explicitly (mirrored by NULLIF in the oracle SQL);
    // same for vy = 0 in the reduction ratio.
    m.select(col("grp"), col("n_units"),
      when(col("vx") =!= 0, round(col("cxy") / col("vx"), digits)).as("theta"),
      round(col("vy"), digits).as("var_y"),
      when(col("vx") =!= 0,
        round(col("vy") - col("cxy") * col("cxy") / col("vx"), digits))
        .as("var_adj"),
      when(col("vx") =!= 0 && col("vy") =!= 0,
        round((col("vy") - col("cxy") * col("cxy") / col("vx")) / col("vy"),
          digits)).as("reduction"))
  }

  /** Per-group weighted median: the smallest value whose cumulative
    * weight reaches half the group total, in exact LONG weights. No
    * value arithmetic — the median is an input value, so there is
    * nothing to round. Output: `(group, w_median)`.
    *
    * Scale design: the median is determined at VALUE granularity, so
    * the weights are first hash-aggregated per (group, value) — fully
    * parallel over the raw rows — and only the per-value distribution
    * flows through the cumulative window. With few groups the window
    * has few partitions, but it now sorts distinct values, not rows
    * (a 10× smoke of the row-level formulation measured 5.7× growth
    * from exactly that funnel; this one holds ~linear).
    */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    val perValue = df.groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(weightCol).cast("long")).as("_w"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
    val cum = perValue.withColumn("_cum",
      sum(col("_w")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val tot = perValue.groupBy(col(groupCol)).agg(sum(col("_w")).as("_tot"))
    cum.join(tot, groupCol)
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("w_median"))
  }

  /** Concentration diagnostics of a per-key count distribution:
    * Gini coefficient plus top-1/top-10 share — the "is this key
    * skewed enough to need salting?" report, computed ON the engine.
    *
    * Scale design: a direct Gini ranks every key globally (a
    * single-task sort at 10⁸ keys). Instead the rank·count sum is
    * computed from the COUNT-OF-COUNTS histogram: keys sharing a
    * count value occupy a contiguous rank block, and the block's rank
    * sum is closed-form from the cumulative key counts — so the only
    * windows run over DISTINCT COUNT VALUES (a tiny domain even at
    * petabyte scale), all in exact integer arithmetic, and the heavy
    * data only ever passes through hash aggregations. Output one row:
    * `(n_keys, total, gini, top1_share, top10_share)`.
    */
  def countConcentration(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val hist = counts.groupBy(col("n")).agg(count(lit(1)).as("f"))
    val asc = Window.orderBy(col("n").asc)
    val desc = Window.orderBy(col("n").desc)
    val h = hist
      .withColumn("cumF",
        sum(col("f")).over(asc.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prevF", coalesce(
        sum(col("f")).over(asc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("prevD", coalesce(
        sum(col("f")).over(desc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val k = h.agg(
      sum(col("f")).as("n_keys"),
      sum(col("n") * col("f")).as("total"),
      // ascending ranks i over a constant-count block sum to
      // cumF(cumF+1)/2 − prevF(prevF+1)/2 — exact LONG arithmetic
      sum(expr("n * (cumF * (cumF + 1) DIV 2 - prevF * (prevF + 1) DIV 2)"))
        .as("iw"),
      sum(col("n") * greatest(lit(0L), least(col("f"), lit(1L) - col("prevD"))))
        .as("top1"),
      sum(col("n") * greatest(lit(0L), least(col("f"), lit(10L) - col("prevD"))))
        .as("top10"))
    k.select(col("n_keys"), col("total"),
      round(lit(2.0) * col("iw") / (col("n_keys") * col("total")).cast("double") -
        (col("n_keys") + 1).cast("double") / col("n_keys"), 6).as("gini"),
      round(col("top1").cast("double") / col("total"), 6).as("top1_share"),
      round(col("top10").cast("double") / col("total"), 6).as("top10_share"))
  }

  /** Association rules over co-occurrence pairs: for every directed
    * pair (a → b) with support ≥ `minSupport` baskets, confidence
    * `supp(ab)/supp(a)` and lift `N·supp(ab)/(supp(a)·supp(b))`. The
    * pair table comes from a basket self-join bounded by basket width;
    * item supports are one hash aggregation joined back on each side
    * (broadcast-sized next to the pair table). All counts exact
    * integers; confidence/lift are final scalar divisions. Output:
    * `(ante, cons, supp_ab, confidence, lift)` — top `k` by lift.
    */
  def assocRules(baskets: DataFrame, basketCol: String, itemCol: String,
                 minSupport: Long, k: Int): DataFrame = {
    val bi = baskets.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val nBaskets = bi.select(col("bk")).distinct().count()
    val supp = bi.groupBy(col("it")).agg(count(lit(1)).as("supp"))
    // pair counts are SYMMETRIC (supp(a,b) = supp(b,a)), so only the
    // a < b half is generated, counted and support-filtered; the
    // mirror is re-derived afterwards on the (tiny) surviving rows —
    // halves the pair shuffle and the aggregation hash (round-14,
    // guide §2.3 "shuffle fewer bytes"). Output rows are identical.
    val half = bi.toDF("bk", "ante").join(bi.toDF("bk", "cons"), "bk")
      .filter(col("ante") < col("cons"))
      .groupBy(col("ante"), col("cons")).agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= minSupport)
    val pairs = half.unionByName(half.select(col("cons").as("ante"),
      col("ante").as("cons"), col("supp_ab")))
    pairs
      .join(supp.toDF("ante", "supp_a"), "ante")
      .join(supp.toDF("cons", "supp_c"), "cons")
      .select(col("ante"), col("cons"), col("supp_ab"),
        round(col("supp_ab").cast("double") / col("supp_a"), 6)
          .as("confidence"),
        round(lit(nBaskets.toDouble) * col("supp_ab") /
          (col("supp_a") * col("supp_c")).cast("double"), 6).as("lift"))
      .orderBy(col("lift").desc, col("ante"), col("cons")).limit(k)
  }

  /** Per-group robust location/scale and outlier count: exact median
    * and MAD (median absolute deviation) via the same per-(group,
    * value) histogram technique as [[weightedMedian]] — two histogram
    * passes, never a per-row global sort. A value is an outlier when
    * `|x − med| > cut · MAD` (cut ≈ 3.5/0.6745 for the usual modified
    * z-score threshold — passed explicitly to keep every constant in
    * the plan). Inputs with ≤2 fractional digits stay EXACT through
    * the |x − med| arithmetic, so both medians and the outlier count
    * are integers/2-digit decimals — nothing floating anywhere.
    * Output: `(group, n, med, mad, n_outliers)`.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  cut: Double): DataFrame = {
    val vd = col(valueCol).cast(DecimalType(18, 2))
    // consumed 3× (median, deviations, final outlier agg) — shuffle
    // to full parallelism on (grp, v) ONCE and materialize: the
    // histogram groupBy reuses the partitioning, and a single-file
    // input no longer serializes every downstream pass
    val base = df.select(col(groupCol).as("grp"), vd.as("v"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("grp"), col("v"))
      .localCheckpoint()
    def medianOf(values: DataFrame): DataFrame = {
      val pv = values.groupBy(col("grp"), col("v"))
        .agg(count(lit(1)).as("_w"))
      val w = Window.partitionBy(col("grp")).orderBy(col("v").asc)
      val cum = pv.withColumn("_cum",
        sum(col("_w")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val tot = pv.groupBy(col("grp")).agg(sum(col("_w")).as("_tot"))
      cum.join(tot, "grp").filter(col("_cum") * 2 >= col("_tot"))
        .groupBy(col("grp")).agg(min(col("v")).as("med"))
    }
    // med/mad are group-cardinality frames — broadcast them, or the
    // equi-join on grp re-exchanges the fact side into as many
    // partitions as there are groups (one task streamed 5M rows in
    // the 10× smoke)
    val med = medianOf(base)
    val dev = base.join(broadcast(med), "grp")
      .select(col("grp"), abs(col("v") - col("med")).as("v"))
    val mad = medianOf(dev).withColumnRenamed("med", "mad")
    base.join(broadcast(med), "grp").join(broadcast(mad), "grp")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        min(col("med")).cast("double").as("med"),
        min(col("mad")).cast("double").as("mad"),
        sum(when(abs(col("v") - col("med")) > lit(cut) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Rolling Pearson correlation between two pre-aggregated series
    * columns over a trailing window of `lookback` rows (e.g. 7 days
    * over a daily frame): the time-series co-movement signal. Moment
    * sums over the frame run in EXACT decimals (inputs ≤2 fractional
    * digits), the closed form is per-row scalar double work, and
    * degenerate frames (fewer than `minRows` rows or zero variance)
    * yield NULL instead of dividing by zero on one engine and Inf on
    * another. The window input is the aggregated series — day-count
    * rows, never the raw table. Output: the input columns plus
    * `(n_win, corr)`.
    */
  def rollingCorr(series: DataFrame, orderCol: String, xCol: String,
                  yCol: String, lookback: Int, minRows: Int = 3,
                  digits: Int = 6): DataFrame = {
    val xd = col(xCol).cast(DecimalType(18, 2))
    val yd = col(yCol).cast(DecimalType(18, 2))
    val w = Window.orderBy(col(orderCol).asc)
      .rowsBetween(-(lookback - 1), 0)
    val withMoments = series
      .withColumn("_n", count(lit(1)).over(w).cast("double"))
      .withColumn("_sx", sum(xd).over(w).cast("double"))
      .withColumn("_sy", sum(yd).over(w).cast("double"))
      .withColumn("_sxx", sum(xd * xd).over(w).cast("double"))
      .withColumn("_syy", sum(yd * yd).over(w).cast("double"))
      .withColumn("_sxy", sum(xd * yd).over(w).cast("double"))
    val varX = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val varY = col("_n") * col("_syy") - col("_sy") * col("_sy")
    withMoments
      .withColumn("n_win", col("_n").cast("long"))
      .withColumn("corr",
        when(col("_n") >= minRows && varX > 0 && varY > 0,
          round((col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
            (sqrt(varX) * sqrt(varY)), digits)))
      .drop("_n", "_sx", "_sy", "_sxx", "_syy", "_sxy")
  }

  /** Quantile normalization: map every (group, value) onto the GLOBAL
    * value at the same (or nearest-below) CDF position — the
    * distribution-alignment transform for cross-group feature
    * calibration (batch-effect correction). Both CDFs come from
    * per-value histograms (the [[weightedMedian]] scale discipline —
    * windows only over distinct values), and the alignment itself is
    * an as-of match expressed as one ignore-nulls window over the
    * per-group union of reference and probe points (reference points
    * replicated per group: #groups × #distinct-values rows, bounded
    * by the value domain, never by the table). A probe below the
    * smallest reference CDF maps to NULL. Output:
    * `(grp, v, cdf, v_norm)` per distinct (group, value).
    *
    * SCALE CONTRACT — the global-CDF window: "distinct values" is a
    * histogram bound only when the value column is discrete/rounded.
    * A CONTINUOUS value column makes distinct ≈ rows and the
    * partitionless window table-sized. Corpus-scale callers set
    * `binDigits = Some(d)`: values are decimal-floor binned
    * (`⌊v·10^d⌋/10^d` — floor, not round: exact on doubles and
    * engine-portable, see [[graft.ml.Eval]]) BEFORE both CDFs, which
    * provably bounds every window input to ≤ (max−min)·10^d + 1 rows;
    * the output `v`/`v_norm` are then bin representatives.
    */
  def quantileNormalize(df: DataFrame, groupCol: String,
                        valueCol: String,
                        binDigits: Option[Int] = None): DataFrame = {
    val vb = binDigits.map { d =>
      val p = math.pow(10.0, d)
      floor(col(valueCol) * lit(p)) / lit(p)
    }.getOrElse(col(valueCol))
    val pv = df.groupBy(col(groupCol).as("grp"), vb.as("v"))
      .agg(count(lit(1)).as("w"))
    val wg = Window.partitionBy(col("grp")).orderBy(col("v").asc)
    val tot = pv.groupBy(col("grp")).agg(sum(col("w")).as("tot"))
    val gc = pv
      .withColumn("cum",
        sum(col("w")).over(wg.rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(tot), "grp")
      .select(col("grp"), col("v"),
        round(col("cum").cast("double") / col("tot"), 9).as("cdf"))
    val gv = df.groupBy(vb.as("v")).agg(count(lit(1)).as("w"))
    val wAll = Window.orderBy(col("v").asc)
    val gtot = gv.agg(sum(col("w")).as("tot"))
    // global CDF: the window runs over distinct values only (the
    // one safe partitionless-window case, same as the q118 share)
    val gcdf = gv
      .withColumn("cum",
        sum(col("w")).over(wAll.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(gtot))
      .select(col("v").as("v_ref"),
        round(col("cum").cast("double") / col("tot"), 9).as("cdf"))
    val groups = gc.select(col("grp")).distinct()
    // the group list is the tiny side (the CDF frame is value-domain
    // sized): broadcast it so the replicate join never exchanges gcdf
    val refs = broadcast(groups).crossJoin(gcdf)
      .select(col("grp"), lit(null).cast("double").as("v"), col("cdf"),
        lit(0).as("tag"), col("v_ref"))
    val probes = gc.select(col("grp"), col("v"), col("cdf"),
      lit(1).as("tag"), lit(null).cast("double").as("v_ref"))
    val order = Window.partitionBy(col("grp"))
      .orderBy(col("cdf").asc, col("tag").asc,
        coalesce(col("v"), col("v_ref")).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    refs.unionByName(probes)
      .withColumn("v_norm", last(col("v_ref"), ignoreNulls = true).over(order))
      .filter(col("tag") === 1)
      .select(col("grp"), col("v"), col("cdf"), col("v_norm"))
  }

  /** Pairwise Welch t-tests between all group pairs (a < b) of
    * `valueCol` (≤2 fractional digits): the unequal-variance A/B test.
    * Per-group moments are EXACT decimal sums (one aggregation, any
    * partitioning); the t statistic and Welch–Satterthwaite degrees of
    * freedom are closed-form scalar double ops on the tiny group-stats
    * frame. Output: `(type_a, type_b, n_a, n_b, t_welch, dof)`.
    */
  def welchPairs(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val d2 = col(valueCol).cast(DecimalType(18, 2))
    val g = df.groupBy(col(groupCol).as("grp"))
      .agg(count(col(valueCol)).as("n"),
        sum(d2).cast("double").as("s1"),
        sum(d2 * d2).cast("double").as("s2"))
      .select(col("grp"), col("n"),
        (col("s1") / col("n")).as("m"),
        // sample variance from exact sums; all-equal groups give 0
        ((col("s2") - col("s1") * col("s1") / col("n")) /
          (col("n").cast("double") - lit(1.0))).as("v"))
    val a = g.select(col("grp").as("type_a"), col("n").as("n_a"),
      col("m").as("m_a"), col("v").as("v_a"))
    val b = g.select(col("grp").as("type_b"), col("n").as("n_b"),
      col("m").as("m_b"), col("v").as("v_b"))
    // Zero-variance guards: two all-constant groups give se_a+se_b = 0.
    // Spark's non-ANSI x/0 yields NULL but DuckDB yields Inf/NaN, so
    // an unguarded divide makes oracle parity data-dependent (the q110
    // sigma=0 lesson). Guard here, NULLIF in the oracle SQL.
    a.join(b, col("type_a") < col("type_b"))
      .withColumn("se_a", col("v_a") / col("n_a"))
      .withColumn("se_b", col("v_b") / col("n_b"))
      .withColumn("se", col("se_a") + col("se_b"))
      .withColumn("dof_den",
        col("se_a") * col("se_a") / (col("n_a").cast("double") - lit(1.0)) +
          col("se_b") * col("se_b") / (col("n_b").cast("double") - lit(1.0)))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        when(col("se") =!= 0,
          round((col("m_a") - col("m_b")) / sqrt(col("se")), 4)).as("t_welch"),
        when(col("dof_den") =!= 0,
          round(col("se") * col("se") / col("dof_den"), 2)).as("dof"))
  }
}
