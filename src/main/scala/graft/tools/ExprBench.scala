package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Scratch micro-bench: TokenSetCount vs the size(filter(IN)) HOF on
  * the sf1 documents table. Not part of any gate.
  */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(Sessions.builder(16, "expr-bench").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val markers = Seq("the", "a", "and", "of", "in", "to", "is")
    val list = markers.map(s => s"'$s'").mkString(", ")
    val docs = spark.read.parquet("/tmp/graft_sf1/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .localCheckpoint()
    def time(tag: String)(c: org.apache.spark.sql.Column): Unit = {
      // warm
      docs.select(sum(c)).collect()
      val reps = 5
      val t0 = System.nanoTime()
      var s = 0L
      (1 to reps).foreach { _ => s += docs.select(sum(c)).collect()(0).getLong(0) }
      println(f"$tag%-10s ${(System.nanoTime() - t0) / 1e6 / reps}%8.1f ms/rep (sum $s)")
    }
    time("native")(graft.functions.TextExprs.tokenSetCount(col("toks"), markers).cast("long"))
    time("hof")(expr(s"size(filter(toks, t -> t IN ($list)))").cast("long"))
    time("native2")(graft.functions.TextExprs.tokenSetCount(col("toks"), markers).cast("long"))
    time("hof2")(expr(s"size(filter(toks, t -> t IN ($list)))").cast("long"))

    // full languageId shape: 5 marker sets + greatest + when-chain
    val profiles = Seq(
      "en" -> Seq("the", "table", "row"), "es" -> Seq("query", "value", "vector"),
      "de" -> Seq("customer", "join", "column"), "fr" -> Seq("scan", "data", "batch"),
      "zh" -> Seq("small", "sort", "stream"))
    def langPlan(mk: Seq[String] => org.apache.spark.sql.Column) = {
      val scored = profiles.foldLeft(docs) { case (df, (l, m)) =>
        df.withColumn(s"_s_$l", mk(m))
      }
      val best = greatest(profiles.map { case (l, _) => col(s"_s_$l") }: _*)
      val firstWins = profiles.foldRight(lit("und")) { case ((l, _), e) =>
        when(col(s"_s_$l") === best, l).otherwise(e)
      }
      scored.select(col("doc_id"), firstWins.as("lang"), best.as("score"))
    }
    def timePlan(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      // consume every output column so nothing prunes away
      def run() = df.agg(sum(col("score")), sum(length(col("lang")))).collect()
      run() // warm
      val reps = 5
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => run())
      println(f"$tag%-10s ${(System.nanoTime() - t0) / 1e6 / reps}%8.1f ms/rep")
    }
    timePlan("lang-nat")(langPlan(m =>
      graft.functions.TextExprs.tokenSetCount(col("toks"), m)))
    timePlan("lang-hof")(langPlan(m =>
      expr(s"size(filter(toks, t -> t IN (${m.map(s => s"'$s'").mkString(", ")})))")))
    timePlan("lang-nat2")(langPlan(m =>
      graft.functions.TextExprs.tokenSetCount(col("toks"), m)))
    timePlan("lang-hof2")(langPlan(m =>
      expr(s"size(filter(toks, t -> t IN (${m.map(s => s"'$s'").mkString(", ")})))")))
    spark.stop()
  }
}
