package graft.streaming

import graft.llm.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING corpus curation — the continuous-ingestion face of
  * [[graft.llm.CorpusPipeline]]: each micro-batch of documents runs
  * the same language → quality → exact-dedup → near-dup funnel, but
  * against a PERSISTED store, so a batch costs O(|batch| +
  * collisions), never O(corpus):
  *
  *  - exact dedup probes the store's content-hash set (anti-join on
  *    md5 — the hash table is one 32-char column, a fraction of
  *    corpus bytes);
  *  - near-dup probes the store's MinHash signature index via
  *    [[Dedup.incrementalNearDupVerified]] (the q141 contract: the
  *    corpus is re-read as signatures, 32–64 longs/doc; TEXT is point-
  *    read only for band collisions);
  *  - survivors are APPENDED to the corpus/hash/signature tables —
  *    the stored state grows only by what survives, and nothing ever
  *    rewrites the corpus-sized tables;
  *  - per-source running stats (O(sources) rows) are folded forward
  *    and the mixture plan re-derived from them
  *    ([[Sampling.mixturePlanFromStats]]) — continuous re-planning
  *    without re-scanning the corpus.
  *
  * Idempotent replay: foreachBatch is at-least-once on failure — a
  * replayed micro-batch converges to exactly-once STORE contents:
  * already-ingested ids drop out at the leading id anti-join, and the
  * batch's previously-REJECTED ids re-run the funnel only to be
  * rejected again by the same store state (their surviving twins'
  * content hashes and signatures are already present), so every
  * append is empty. The same property makes the pipeline safe to
  * backfill: feeding an already-processed input again is a store
  * no-op.
  *
  * Ordering semantics (pinned, mirrored by the q182 oracle): within
  * a batch, exact dedup keeps the MIN id per content hash; the store
  * always wins against the batch (store-vs-batch collisions drop the
  * batch doc); batch-internal near-dup drops the larger id of each
  * verified pair AFTER store collisions are removed. A cross-batch
  * near-dup chain is greedy-online: a doc dropped for colliding with
  * the store never enters the index, so a later doc colliding only
  * with IT is kept — the documented difference from the all-at-once
  * batch pipeline.
  */
object CurationStream {

  final case class Config(lang: String = "en", minQuality: Double = 0.5,
                          jaccardThreshold: Double = 0.5,
                          n: Int = 3, numHashes: Int = 64, bands: Int = 32,
                          sourceCol: String = "source",
                          weights: Map[String, Double] = Map.empty,
                          budget: Long = 0L, maxEpochs: Int = 4)

  private def readOpt(spark: SparkSession, path: String): Option[DataFrame] =
    try {
      val df = spark.read.parquet(path)
      Some(df)
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Curate ONE micro-batch against the store and commit the
    * survivors — the foreachBatch body, directly callable for the
    * batch twin (q182) and backfills. Returns the batch funnel:
    * `(stage, n)` rows for arrived / lang / quality / exact_dedup /
    * near_dup / store_total (post-commit corpus size).
    */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
                   profiles: Seq[(String, Seq[String])],
                   storePath: String, cfg: Config = Config()): DataFrame = {
    val spark = batch.sparkSession
    val storedDocs = readOpt(spark, s"$storePath/corpus")

    // replay idempotence: ids already ingested drop out up front, so a
    // redelivered micro-batch appends nothing
    val arrived0 = batch.dropDuplicates(idCol)
    val a = storedDocs
      .map(st => arrived0.join(st.select(col(idCol)), Seq(idCol), "left_anti"))
      .getOrElse(arrived0)
      .localCheckpoint()

    val langKeep = TextAnalysis.languageId(a, idCol, textCol, profiles)
      .filter(col("predicted_lang") === cfg.lang).select(col(idCol))
    val s2 = a.join(langKeep, Seq(idCol), "left_semi")
    val qualKeep = TextAnalysis.qualityScore(s2, idCol, textCol)
      .filter(col("quality") >= cfg.minQuality).select(col(idCol))
    val s3 = s2.join(qualKeep, Seq(idCol), "left_semi").localCheckpoint()

    // exact dedup: batch-internal keep-min-id, then the store's
    // content-hash set (the store always wins)
    val keepIds = Dedup.exactDedup(s3, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val s4a = s3.join(keepIds, Seq(idCol), "left_semi")
    val s4 = readOpt(spark, s"$storePath/hashes")
      .map(h => s4a.withColumn("_h", md5(col(textCol)))
        .join(h, Seq("_h"), "left_anti").drop("_h"))
      .getOrElse(s4a)
      .localCheckpoint()

    // near-dup: store collisions first (signature-index probe, text
    // point-reads only for collisions), then batch-internal pairs
    val s5a = readOpt(spark, s"$storePath/sigs") match {
      case Some(sigs) =>
        val drops = Dedup.incrementalNearDupVerified(s4, idCol, textCol,
            sigs, storedDocs.get, n = cfg.n, numHashes = cfg.numHashes,
            bands = cfg.bands, threshold = cfg.jaccardThreshold)
          .select(col("id_new").as(idCol)).distinct()
        s4.join(drops, Seq(idCol), "left_anti")
      case None => s4
    }
    val internalDrop = Dedup.minHashNearDupVerified(s5a, idCol, textCol,
        n = cfg.n, numHashes = cfg.numHashes, bands = cfg.bands,
        threshold = cfg.jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val s5 = s5a.join(internalDrop, Seq(idCol), "left_anti").localCheckpoint()

    // commit: append-only on the corpus-sized tables
    s5.write.mode("append").parquet(s"$storePath/corpus")
    s5.select(md5(col(textCol)).as("_h"))
      .write.mode("append").parquet(s"$storePath/hashes")
    Dedup.minHashSignatures(s5, idCol, textCol, cfg.n, cfg.numHashes)
      .write.mode("append").parquet(s"$storePath/sigs")

    // incremental mixture re-plan from O(sources) running stats
    if (cfg.weights.nonEmpty) {
      val batchStats = s5.select(col(cfg.sourceCol).as("source"),
          size(split(col(textCol), " ")).cast("long").as("_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("_tok")).as("avail_tokens"))
      val merged = readOpt(spark, s"$storePath/source_stats")
        .map(_.unionByName(batchStats)).getOrElse(batchStats)
        .groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("avail_tokens")).as("avail_tokens"))
        // materialize BEFORE overwriting the files being read
        .localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$storePath/source_stats")
      Sampling.mixturePlanFromStats(merged, cfg.weights, cfg.budget,
          cfg.maxEpochs)
        .write.mode("overwrite").parquet(s"$storePath/mixture_plan")
    }

    // lazy funnel — ONE job at consumption instead of six eager
    // counts (the commit above already materialized every stage frame,
    // so the union re-reads checkpoints, not the operator chain)
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    Seq(stage("arrived", a), stage("lang", s2), stage("quality", s3),
      stage("exact_dedup", s4), stage("near_dup", s5),
      stage("store_total", spark.read.parquet(s"$storePath/corpus")))
      .reduce(_ unionByName _)
  }

  /** The continuous pipeline: documents stream → per-micro-batch
    * curation against the store. The funnel of each batch is appended
    * to `storePath/funnel` as the pipeline's health log. Restart-safe
    * via the checkpoint + the replay idempotence of [[processBatch]].
    */
  def start(docsStream: DataFrame, idCol: String, textCol: String,
            profiles: Seq[(String, Seq[String])], storePath: String,
            checkpoint: String, cfg: Config = Config())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, idCol, textCol, profiles, storePath, cfg)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(s"$storePath/funnel")
      }
      .start()
}
