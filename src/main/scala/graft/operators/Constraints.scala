package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checking (the Deequ-style gate a pipeline
  * runs before publishing a table): each rule evaluates to one row of
  * (constraint, passed, observed, threshold), so the report is itself
  * a queryable table and CI can fail on `passed = false`.
  *
  * Every rule is an aggregation over the checked frame; rules on the
  * same frame share one pass (single `agg`), and the referential-
  * integrity rule is a broadcast-friendly anti-join count. Nothing
  * collects to the driver.
  */
object Constraints {

  final case class Rule(name: String, observed: Column, passed: Column)

  /** Fraction of NULL values in a column (0 = fully populated). */
  def nullRate(c: String, maxRate: Double): Rule = {
    val obs = round(sum(when(col(c).isNull, 1L).otherwise(0L))
      .cast("double") / count(lit(1)), 6)
    Rule(s"null_rate($c) <= $maxRate", obs, obs <= maxRate)
  }

  /** Column is unique (distinct count == row count). */
  def unique(c: String): Rule = {
    val obs = round(countDistinct(col(c)).cast("double") / count(lit(1)), 6)
    Rule(s"unique($c)", obs, obs === 1.0)
  }

  /** All values inside [lo, hi] (nulls don't violate — pair with
    * [[nullRate]] to forbid them).
    */
  def inRange(c: String, lo: Double, hi: Double): Rule = {
    val viol = sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
    Rule(s"in_range($c, $lo, $hi)", viol.cast("double"), viol === 0L)
  }

  /** Evaluate single-pass rules over one frame → one report row each. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(r.observed.as(s"_o$i"), r.passed.as(s"_p$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    rules.zipWithIndex.map { case (r, i) =>
      one.select(lit(r.name).as("constraint"),
        col(s"_p$i").as("passed"), col(s"_o$i").as("observed"))
    }.reduce(_ unionByName _)
  }

  /** Referential integrity: every non-null `fkCol` of `child` exists
    * as `pkCol` in `parent`. Observed = orphan count (anti-join).
    */
  def referential(child: DataFrame, fkCol: String,
                  parent: DataFrame, pkCol: String): DataFrame = {
    val orphans = child.filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as(fkCol)), Seq(fkCol), "left_anti")
    orphans.agg(count(lit(1)).as("_n"))
      .select(lit(s"referential($fkCol -> $pkCol)").as("constraint"),
        (col("_n") === 0L).as("passed"),
        col("_n").cast("double").as("observed"))
  }
}
