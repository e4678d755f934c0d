package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bit-deterministic numeric aggregation helpers.
  *
  * Floating-point `sum`/`avg` over a shuffled dataset is
  * order-dependent: different partitionings give different last-ULP
  * results, which breaks hash-compared oracles and makes runs
  * non-reproducible. These helpers aggregate **exactly** in decimal
  * (inputs in the testdata carry ≤2 fractional digits) and only then
  * cast to double, so the result is a single deterministic IEEE value
  * no matter the partitioning or the engine. The same expression
  * shape is mirrored in the DuckDB oracle SQL.
  *
  * This matters at 100 TB for reasons beyond the oracle: exact decimal
  * accumulation makes re-runs and retried stages produce identical
  * bytes (idempotent sinks), and Spark's decimal sum is still
  * whole-stage-codegen'd, so the cost is a wider accumulator, not a
  * broken pipeline.
  */
object Det {

  private val Scale2 = DecimalType(18, 2)

  /** Exact sum of a ≤2-fractional-digit column, as double. */
  def sum2(c: Column): Column = sum(c.cast(Scale2)).cast("double")

  /** Exact sum rounded for output. */
  def sumRounded(c: Column, digits: Int = 2): Column = round(sum2(c), digits)

  /** Deterministic mean: exact decimal sum, double division by count,
    * rounded. Identical op shape to the oracle's
    * `ROUND(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x), d)`.
    */
  def avgRounded(c: Column, digits: Int = 4): Column =
    round(sum2(c) / count(c), digits)

  /** Deterministic sample stddev via exact sums of x and x²:
    * sqrt((Σx² − (Σx)²/n) / (n−1)) with all post-sum arithmetic in
    * double. Inputs must keep x² within 2-digit-scale exactness
    * (true for the integral/2-digit testdata measures).
    */
  def stddevRounded(c: Column, digits: Int = 4): Column = {
    val n  = count(c).cast("double")
    val s1 = sum2(c)
    val s2 = sum((c.cast(Scale2) * c.cast(Scale2))).cast("double")
    round(sqrt((s2 - s1 * s1 / n) / (n - lit(1.0))), digits)
  }

  /** Revenue-style exact product sum: Σ price·(1−disc) in decimal,
    * then double, rounded. Matches
    * `ROUND(CAST(SUM(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))) AS DOUBLE), r)`.
    */
  def sumProductRounded(price: Column, discount: Column, digits: Int = 2): Column =
    round(
      sum(price.cast(Scale2) * (lit(1).cast(Scale2) - discount.cast(Scale2)))
        .cast("double"),
      digits)

  /** Pearson correlation from EXACT decimal moment sums — the built-in
    * `corr` accumulates doubles, whose value depends on partition
    * visit order; this variant sums x, y, x², y², xy as decimals
    * (order-independent), applies the closed form once in double, and
    * rounds. Identical in any engine evaluating the same formula.
    */
  def corrRounded(x: Column, y: Column, digits: Int = 6): Column = {
    val xd = x.cast(Scale2); val yd = y.cast(Scale2)
    val n = count(lit(1)).cast("double")
    val sx = sum(xd).cast("double"); val sy = sum(yd).cast("double")
    val sxx = sum(xd * xd).cast("double")
    val syy = sum(yd * yd).cast("double")
    val sxy = sum(xd * yd).cast("double")
    round((n * sxy - sx * sy) /
      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), digits)
  }
}
