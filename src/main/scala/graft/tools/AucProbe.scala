package graft.tools
import graft.{Sessions, SparkEntry}
import graft.llm.TextAnalysis
import graft.ml.{Eval, QualityModel}
import org.apache.spark.sql.functions._
object AucProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(Sessions.builder(16, "graft-aucprobe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val d = graft.sources.Tables.load(spark, dir, "documents")
      val labels = TextAnalysis.qualityScore(d, "doc_id", "text")
        .select(col("doc_id"), (col("quality") >= 0.5).cast("int").as("label"))
      val sample = labels.filter(pmod(col("doc_id"), lit(5)) === 0)
      val scores = QualityModel.fitScore(d, "doc_id", "text", sample, "label")
      val heldOut = scores.join(labels, Seq("doc_id"))
        .filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val auc = Eval.aucDf(heldOut, "label", "quality_prob").head().getDouble(0)
      println(s"AUCPROBE $dir $auc")
    }
    spark.stop()
  }
}
