package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val profiles = Seq(
    "en" -> Seq("the", "table", "row"),
    "es" -> Seq("query", "value", "vector"))

  test("funnel counts are monotonically non-increasing and stages nest by id") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val st = CorpusPipeline.stages(docs, "doc_id", "text", profiles)
    val ids = st.map { case (name, df) =>
      name -> df.select("doc_id").as[Long].collect().toSet
    }
    ids.sliding(2).foreach { case Seq((a, sa), (b, sb)) =>
      assert(sb.subsetOf(sa), s"stage $b is not a subset of $a")
    }
    assert(ids.last._2.nonEmpty, "curated corpus is empty")
  }

  test("curate drops the planted exact duplicate and keeps one copy") {
    val docs = Seq(
      (1L, "the table row the table row alpha beta gamma delta"),
      (2L, "the table row the table row alpha beta gamma delta"), // exact dup
      (3L, "query value vector query value vector")                // not 'en'
    ).toDF("doc_id", "text")
    // permissive quality/sample so only lang+dedup act
    val out = CorpusPipeline.curate(docs, "doc_id", "text", profiles,
        CorpusPipeline.Config(minQuality = 0.0, sampleFraction = 1.0))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L)) // dup collapsed to min id, es doc filtered
  }
}
