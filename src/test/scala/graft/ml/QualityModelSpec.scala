package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // Separable corpus: "good" docs are long, stopword-rich, lexically
  // diverse; "junk" docs are short repetitive shouting. Ids interleave
  // classes so the %2 train split sees both.
  private lazy val docs = {
    val good = (0 until 40).map { i =>
      (i * 2L, "the quick brown fox jumps over a lazy dog in the " +
        s"meadow and runs to the river bank v$i " +
        (0 until 30).map(j => s"w${(i * 7 + j) % 90}").mkString(" "))
    }
    val junk = (0 until 40).map { i =>
      (i * 2L + 1, ("spam" + (i % 3)) * 1 + " spam spam spam!!!")
    }
    (good ++ junk).toDF("doc_id", "text").cache()
  }

  private lazy val labels =
    docs.select(col("doc_id"),
      (col("doc_id") % 2 === 0).cast("int").as("label"))

  test("fitScore separates held-out good docs from junk (AUC = 1)") {
    val sample = labels.filter(col("doc_id") % 4 < 2) // half of each class
    val scores = QualityModel.fitScore(docs, "doc_id", "text",
      sample, "label")
    val heldOut = scores.join(labels, Seq("doc_id"))
      .filter(col("doc_id") % 4 >= 2)
    val auc = Eval.aucDf(heldOut, "label", "quality_prob")
      .head().getDouble(0)
    assert(auc == 1.0, s"held-out AUC $auc")
    // and the probabilities actually split around 0.5
    val byClass = scores.join(labels, Seq("doc_id"))
      .groupBy(col("label")).agg(avg(col("quality_prob")).as("p"))
      .as[(Int, Double)].collect().toMap
    assert(byClass(1) > 0.8 && byClass(0) < 0.2,
      s"class means ${byClass.toSeq.sorted}")
  }

  test("score is a probability and covers every input doc") {
    val model = QualityModel.fit(docs, "doc_id", "text", labels, "label")
    val out = QualityModel.score(model, docs, "doc_id", "text")
      .as[(Long, Double)].collect()
    assert(out.length == 80)
    assert(out.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
  }
}
