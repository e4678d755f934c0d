package graft.tools

import graft.Sessions
import graft.SparkEntry

/** Scratch probe: prints the q124-q126 planted-recall gate rows per sf
  * dir — used to confirm found==planted (LSH/IVF) and pick the SimHash
  * recall_ok bound before freezing the oracle SQL.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(Sessions.builder(8, "graft-recall").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    for (dir <- args; q <- Seq("q124_lsh_recall", "q125_ivf_recall", "q126_simhash_recall")) {
      val rows = SparkEntry.queries(q)(spark, dir).collect().mkString(" ")
      println(s"PROBE $dir $q $rows")
    }
    for (dir <- args) {
      val docs = graft.sources.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val planted = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zq")).as("text"))
      val nf = graft.llm.Dedup.simHashNearDup(docs.unionByName(planted),
          "doc_id", "text", maxDist = 3)
        .filter(col("id_b") === col("id_a") + 1000000L).count()
      println(s"PROBE $dir simhash_raw $nf")
    }
    spark.stop()
  }
}
