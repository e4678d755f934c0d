package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // two separable populations: "target-like" docs repeat target
  // bigrams, "other" docs repeat disjoint vocabulary
  private lazy val docs = {
    val target = (0L until 60L).map(i =>
      (i, "en", ("alpha beta gamma delta " * 6).trim))
    val other = (100L until 160L).map(i =>
      (i, "de", ("zeta eta theta iota " * 6).trim))
    (target ++ other).toDF("doc_id", "lang", "text").cache()
  }

  test("dsirLogWeights separates target-like from off-target documents") {
    val w = Selection.dsirLogWeights(docs, "doc_id", "text",
      col("lang") === "en")
    val byLang = w.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(avg("log_w").as("m"))
      .as[(String, Double)].collect().toMap
    assert(byLang("en") > 0, s"target mean ${byLang("en")}")
    assert(byLang("de") < byLang("en") - 1,
      s"off-target ${byLang("de")} not separated from ${byLang("en")}")
  }

  test("dsirLogWeights is repartition-invariant and counts features correctly") {
    val a = Selection.dsirLogWeights(docs, "doc_id", "text",
      col("lang") === "en").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Selection.dsirLogWeights(docs.repartition(17), "doc_id", "text",
      col("lang") === "en").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
    // 24 tokens per doc -> 23 bigram features
    assert(a.forall(_._2 == 23L))
  }

  test("dsirLogWeights emits nothing for docs with fewer than two tokens") {
    val tiny = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    val w = Selection.dsirLogWeights(tiny, "doc_id", "text", lit(true))
    assert(w.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("dsirResample draws k docs biased toward high weights, deterministically") {
    val k = 40
    val sel = Selection.dsirResample(docs, "doc_id", "text",
      col("lang") === "en", k = k)
    val got = sel.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == k)
    assert(got.map(_._1).distinct.length == k) // without replacement
    val again = Selection.dsirResample(docs.repartition(5), "doc_id", "text",
      col("lang") === "en", k = k).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSet == again.toSet)
    // heavily separated weights: the target population dominates the draw
    val targetShare = got.count(_._1 < 100L).toDouble / k
    assert(targetShare > 0.8, s"target share $targetShare")
  }

  test("diversitySample caps every bucket at perBucket in draw order") {
    // many near-identical docs (one simhash region) + a scattered tail
    val dense = (0L until 200L).map(i => (i, "common text block " + ("pad " * 10).trim))
    val sparse = (1000L until 1040L).map(i => (i, s"unique${i} content ${i * 7} tail${i % 13}"))
    val d = (dense ++ sparse).toDF("doc_id", "text")
    val out = Selection.diversitySample(d, "doc_id", "text", bits = 4, perBucket = 5)
    val per = out.groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(per.values.forall(_ <= 5L), s"bucket overflow: $per")
    // the 200 identical-text docs share one simhash bucket -> ≤ 5 survive
    val keptDense = out.filter(col("doc_id") < 200L).count()
    assert(keptDense <= 5L, s"dense kept $keptDense")
    // ranks are 1..n per bucket and ordered by the draw
    val rows = out.orderBy("bucket", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).toSeq == (1 to rs.length))
      assert(rs.map(_._3).toSeq == rs.map(_._3).sorted.toSeq)
    }
  }

  test("diversitySample is repartition-invariant") {
    val d = (0L until 300L).map(i => (i, s"w${i % 40} x${i % 11} y${i % 7} z${i % 3}"))
      .toDF("doc_id", "text")
    val a = Selection.diversitySample(d, "doc_id", "text", bits = 5, perBucket = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Selection.diversitySample(d.repartition(13), "doc_id", "text",
      bits = 5, perBucket = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
