package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis

/** Model-based document quality scoring — the learned stage of the
  * quality stack (the heuristic stage is
  * [[graft.llm.TextAnalysis.qualityScore]]): a logistic regression
  * over the cheap per-document text features, trained on whatever
  * labels the pipeline has (human ratings, an LLM-judged sample, a
  * downstream-benchmark proxy), then applied to the full corpus. This
  * is the FineWeb-Edu / CCNet-style classifier-filter shape: label a
  * small sample expensively, score everything cheaply.
  *
  * Features are [[TextAnalysis.textStats]]'s seven per-doc scalars —
  * a shuffle-free scan projection. Training cost is bounded by the
  * LABELED frame (small by nature); scoring is one broadcast of the
  * fitted coefficient vector inside spark.ml's transform — narrow,
  * no shuffle, whole-corpus scale-safe.
  */
object QualityModel {

  private val FeatureCols = Seq("n_chars", "n_tokens", "n_unique",
    "avg_token_len", "stop_ratio", "punct_ratio", "digit_ratio")

  private def featurize(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    new VectorAssembler()
      .setInputCols(FeatureCols.toArray)
      .setOutputCol("features")
      .transform(TextAnalysis.textStats(docs, idCol, textCol)
        .na.fill(0.0, FeatureCols))

  /** Fit on the labeled subset: `labels` is (idCol, labelCol ∈ {0,1});
    * only docs with a label train. Deterministic for fixed inputs
    * (L-BFGS over aggregated gradients; standardization on).
    */
  def fit(docs: DataFrame, idCol: String, textCol: String,
          labels: DataFrame, labelCol: String,
          maxIter: Int = 50, regParam: Double = 1e-4): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("features")
      .setLabelCol(labelCol)
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .fit(featurize(docs, idCol, textCol)
        .join(labels.select(col(idCol), col(labelCol).cast("double").as(labelCol)),
          Seq(idCol)))

  /** Score every document: (id, quality_prob) — P(label = 1). */
  def score(model: LogisticRegressionModel, docs: DataFrame,
            idCol: String, textCol: String): DataFrame = {
    val probOf = udfLessProb(model)
    model.transform(featurize(docs, idCol, textCol))
      .select(col(idCol), probOf.as("quality_prob"))
  }

  // spark.ml emits probability as a Vector column; element 1 is P(pos).
  // vector_to_array is the codegen-friendly accessor (no UDF).
  private def udfLessProb(model: LogisticRegressionModel) = {
    import org.apache.spark.ml.functions.vector_to_array
    element_at(vector_to_array(col(model.getProbabilityCol)), 2)
  }

  /** Train on the labeled subset and score the whole corpus in one
    * call — the common serve shape.
    */
  def fitScore(docs: DataFrame, idCol: String, textCol: String,
               labels: DataFrame, labelCol: String): DataFrame =
    score(fit(docs, idCol, textCol, labels, labelCol), docs, idCol, textCol)
}
