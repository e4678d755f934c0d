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

  test("budgetSelect keeps best scores first and never exceeds the budget") {
    // 10 quality tiers x 20 docs x cost 10 => 200 per tier, 2000 total
    val d = (0L until 200L).map(i => (i, (i % 10) / 10.0, 10L))
      .toDF("doc_id", "score", "cost")
    val kept = Selection.budgetSelect(d, "doc_id", "score", "cost", budget = 500L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(kept.map(_._3).sum <= 500L)
    // tiers 0.9 and 0.8 fit entirely (400); boundary tier 0.7 fills ~100
    val byTier = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byTier(0.9) == 20 && byTier(0.8) == 20)
    assert(byTier.getOrElse(0.7, 0) <= 10)
    assert(byTier.keySet.subsetOf(Set(0.9, 0.8, 0.7)))
    // boundary refinement fills most of the remainder
    assert(kept.map(_._3).sum >= 480L, s"sum ${kept.map(_._3).sum}")
  }

  test("budgetSelect keeps everything when the budget covers the input") {
    val d = (0L until 50L).map(i => (i, i / 7.0, 3L)).toDF("doc_id", "score", "cost")
    assert(Selection.budgetSelect(d, "doc_id", "score", "cost", 1000L).count() == 50L)
  }

  test("budgetSelect is repartition-invariant (boundary fill included)") {
    val d = (0L until 300L).map(i => (i, (i % 3) / 3.0, 5L + i % 4))
      .toDF("doc_id", "score", "cost")
    val a = Selection.budgetSelect(d, "doc_id", "score", "cost", 700L)
      .collect().map(r => r.getLong(0)).toSet
    val b = Selection.budgetSelect(d.repartition(11), "doc_id", "score", "cost", 700L)
      .collect().map(r => r.getLong(0)).toSet
    assert(a == b)
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
