package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pipeline a training-data
  * build actually runs, wiring the individual operators in their
  * production order:
  *
  *   raw → language filter → quality filter → exact dedup →
  *   near-dup removal (LSH + exact verify) → deterministic sample
  *
  * Every stage is one of this package's oracle-backed operators, so
  * the whole funnel stays engine-replayable end to end. Stage list is
  * returned (not just the final frame) because corpus builds report
  * per-stage retention — the funnel — as their primary health metric.
  *
  * Scale notes: stages communicate by SEMI/ANTI joins on the id (never
  * re-materializing text through a shuffle); the near-dup stage is the
  * banded-LSH path, not the exhaustive pair join; the final frame is a
  * narrow filter. Nothing here collects to the driver.
  */
object CorpusPipeline {

  final case class Config(lang: String = "en", minQuality: Double = 0.5,
                          jaccardThreshold: Double = 0.5,
                          sampleFraction: Double = 0.5)

  /** Per-stage survivor frames, in pipeline order: (stage name, docs).
    *
    * Eager by design: each stage's KEEP-ID set — tiny relative to the
    * corpus — is materialized (localCheckpoint) as it is built, the
    * way a production build writes stage manifests. Without this,
    * every downstream stage (and every per-stage count in [[funnel]])
    * re-executes the whole upstream operator chain: the LSH+verify
    * near-dup pass alone would run once per remaining stage. The wide
    * text-carrying frames are never materialized — stages recombine
    * docs with id sets by semi/anti join.
    */
  def stages(docs: DataFrame, idCol: String, textCol: String,
             profiles: Seq[(String, Seq[String])],
             cfg: Config = Config()): Seq[(String, DataFrame)] = {
    val langKeep = TextAnalysis.languageId(docs, idCol, textCol, profiles)
      .filter(col("predicted_lang") === cfg.lang).select(col(idCol))
      .localCheckpoint()
    val s2 = docs.join(langKeep, Seq(idCol), "left_semi")

    val qualKeep = TextAnalysis.qualityScore(s2, idCol, textCol)
      .filter(col("quality") >= cfg.minQuality).select(col(idCol))
      .localCheckpoint()
    val s3 = s2.join(qualKeep, Seq(idCol), "left_semi")

    val exactKeep = Dedup.exactDedup(s3, idCol, textCol)
      .select(col("keep_id").as(idCol))
      .localCheckpoint()
    val s4 = s3.join(exactKeep, Seq(idCol), "left_semi")

    // greedy near-dup removal: of each verified pair, the larger id goes
    val nearDrop = Dedup.minHashNearDupVerified(s4, idCol, textCol,
        threshold = cfg.jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
      .localCheckpoint()
    val s5 = s4.join(nearDrop, Seq(idCol), "left_anti")

    val s6 = Sampling.hashSample(s5, idCol, cfg.sampleFraction)

    Seq("raw" -> docs, "lang" -> s2, "quality" -> s3,
      "exact_dedup" -> s4, "near_dup" -> s5, "sample" -> s6)
  }

  /** The funnel report: one (stage, n) row per pipeline stage. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             profiles: Seq[(String, Seq[String])],
             cfg: Config = Config()): DataFrame =
    stages(docs, idCol, textCol, profiles, cfg)
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
      }
      .reduce(_ unionByName _)

  /** The curated corpus itself (last stage). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             profiles: Seq[(String, Seq[String])],
             cfg: Config = Config()): DataFrame =
    stages(docs, idCol, textCol, profiles, cfg).last._2
}
