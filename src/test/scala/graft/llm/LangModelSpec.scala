package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b", "en"),      // transitions: a→b ×2, b→a ×1
    (2L, "a b c", "en"),        // a→b, b→c
    (3L, "x", "de"),            // single token: no transitions
    (4L, "c c c c", "de")       // c→c ×3
  ).toDF("doc_id", "text", "lang")

  test("bigramStream drops <2-token docs and keeps within-doc order pairs") {
    val bg = LangModel.bigramStream(docs, "doc_id", "text")
      .groupBy("bigram").count().as[(String, Long)].collect().toMap
    assert(bg === Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L, "c c" -> 3L))
    assert(LangModel.bigramStream(docs.filter($"doc_id" === 3), "doc_id", "text")
      .count() === 0L)
  }

  test("bigramNll: deterministic transitions score zero; ppl = exp(nll)") {
    val out = LangModel.bigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // doc 4: only c→c transitions, c always followed by c → P=1, nll=0
    assert(out(4L) === ((3L, 0.0, 1.0)))
    // doc 2: a→b has P = c2(a b)/c1(a) = 3/3 = 1 → 0;
    //        b→c has P = 1/2 → ln 2
    val ln2 = BigDecimal(math.round(math.log(2) * 1e6) / 1e6)
    val exp2 = ((0.0 + ln2.toDouble) / 2 * 1e4).round / 1e4
    assert(out(2L)._1 === 2L)
    assert(math.abs(out(2L)._2 - exp2) < 1e-9)
    // single-token doc emits no row
    assert(!out.contains(3L))
  }

  test("vocabulary takes top-k by count with term tiebreak") {
    val v = LangModel.vocabulary(docs, "text", 2)
      .as[(String, Long)].collect().toSeq
    // counts: a=3, b=3, c=4(+1 in doc2)=5? -> a:3 b:3 c:5 x:1
    assert(v === Seq(("c", 5L), ("a", 3L)))
  }

  test("oovStats: rates against a top-k vocab, exact coverage") {
    val out = LangModel.oovStats(docs, "doc_id", "text", "lang", k = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // vocab = {c, a}. en doc1: 4 tok, 2 oov (b,b) = 0.5; en doc2: 3 tok,
    // 1 oov = 0.3333. de doc3: 1 tok 1 oov = 1.0; doc4: 0 oov = 0.0
    assert(out("en")._1 === 2L)
    assert(math.abs(out("en")._2 - (0.5 + 0.3333) / 2) < 1e-4)
    // en coverage = round(1 - 3/7, 4) = 0.5714
    assert(out("en")._3 === 0.5714)
    assert(out("de") === ((2L, 0.5, 0.8)))
  }

  test("pmiCollocations: a perfect collocation outranks chance pairs") {
    // "x y" always co-occur; fillers a/b/c transition randomly-ish
    val corpus = Seq(
      (1L, "x y a b c x y a b c x y", "en"),
      (2L, "b a x y c b a x y c b a", "en"),
      (3L, "c b a x y b c a x y b c", "en")
    ).toDF("doc_id", "text", "lang")
    val out = LangModel.pmiCollocations(corpus, "doc_id", "text",
      k = 3, minCount = 2).collect()
    assert(out.head.getString(0) === "x y")
    // pmi of the deterministic pair: every x is followed by y and
    // every y-predecessor is x → pmi = ln(N / n(x y)) > 0
    assert(out.head.getDouble(2) > 0.0)
  }

  test("chi2Terms: label-exclusive term scores high, universal term zero") {
    val corpus = Seq(
      (1L, "alpha shared", "en"), (2L, "alpha shared", "en"),
      (3L, "alpha shared", "en"), (4L, "beta shared", "de"),
      (5L, "beta shared", "de"), (6L, "beta shared", "de")
    ).toDF("doc_id", "text", "lang")
    val out = LangModel.chi2Terms(corpus, "doc_id", "text", "lang",
        k = 10, minDocs = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    // alpha ∈ all en, no de: perfect 2x2 → chi2 = N = 6
    assert(out(("alpha", "en")) === 6.0)
    assert(out(("beta", "de")) === 6.0)
    // shared ∈ every doc → independence → 0
    assert(out(("shared", "en")) === 0.0)
    assert(out(("shared", "de")) === 0.0)
  }

  test("shardAssign is stable, in-range, and repartition-invariant") {
    val base = Sampling.shardAssign(docs, "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(base.values.forall(s => s >= 0 && s < 8))
    val re = Sampling.shardAssign(docs.repartition(3), "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(base === re)
    // salt changes the assignment function
    val salted = Sampling.shardAssign(docs, "doc_id", 8, salt = "v2")
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(salted.values.forall(s => s >= 0 && s < 8))
  }

  test("refPerplexityBuckets: add-one smoothing, per-lang tertile cuts") {
    // reference slice: bigrams "a b"x2, "b a", "b c"; c1: a->2 b->2; V=3
    val corpus = Seq(
      (0L, "a b a b c", "en", "ref"),
      (10L, "a b", "en", "web"),      // ln(5/3) -> ppl 1.667
      (11L, "z z z z", "en", "web"),  // fully unseen -> uniform 1/V -> ppl 3.0
      (12L, "a b c", "en", "web"),    // (ln(5/3)+ln(5/2))/2 -> ppl 2.041
      (20L, "z z", "de", "web"),
      (21L, "a b", "de", "web"),
      (30L, "x", "en", "web")         // single token: no transitions, no row
    ).toDF("doc_id", "text", "lang", "source")
    val out = LangModel.refPerplexityBuckets(corpus, "doc_id", "text",
        "lang", col("source") === "ref")
      .as[(Long, String, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(out.size === 6 && !out.contains(30L))
    assert(out(10L) === ((1L, 1.667, "head")))
    assert(out(11L) === ((3L, 3.0, "tail")))
    assert(out(12L) === ((2L, 2.041, "head"))) // ties at the cut share a bucket
    assert(out(0L) === ((4L, 2.041, "head")))  // the reference scores itself
    // de cuts are independent of en's: 2 docs -> cut1 at the lower ppl
    assert(out(21L) === ((1L, 1.667, "head")))
    assert(out(20L) === ((1L, 3.0, "middle")))
  }

}
