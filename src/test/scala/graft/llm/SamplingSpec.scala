package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows =
    (0L until 2000L).map(i => (i, s"g${i % 7}")).toDF("id", "grp").cache()

  test("hashSample is deterministic, repartition-invariant, and nested by fraction") {
    val s20 = Sampling.hashSample(rows, "id", 0.2).select("id").as[Long].collect().toSet
    val again = Sampling.hashSample(rows.repartition(13), "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(s20 == again)                      // membership is a pure function of the row
    val s10 = Sampling.hashSample(rows, "id", 0.1).select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s20))                 // draw < f is monotone in f
    assert(math.abs(s20.size / 2000.0 - 0.2) < 0.05, s"got ${s20.size}")
  }

  test("hashSample salting decorrelates draws on the same key") {
    val a = Sampling.hashSample(rows, "id", 0.5, salt = "a").select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows, "id", 0.5, salt = "b").select("id").as[Long].collect().toSet
    val overlap = (a & b).size.toDouble / 2000.0
    assert(math.abs(overlap - 0.25) < 0.06, s"overlap $overlap")  // independent halves ≈ 1/4
  }

  test("groupSample returns exactly min(k, |group|) rows per group, deterministically") {
    val out = Sampling.groupSample(rows, "grp", "id", 5)
    val sizes = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 5L) && sizes.size == 7)
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "grp")
    val t = Sampling.groupSample(tiny, "grp", "id", 5).groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    assert(t == Map("x" -> 2L, "y" -> 1L))
  }

  test("mixStrata applies per-stratum fractions; bounds enforced") {
    val out = Sampling.mixStrata(rows, "grp", "id",
      Map("g0" -> 1.0, "g1" -> 0.0, "g2" -> 0.5))
    val byG = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byG("g0") == rows.filter($"grp" === "g0").count()) // weight 1 keeps all
    assert(!byG.contains("g1"))                               // weight 0 drops all
    assert(byG.get("g2").exists(n => n > 80 && n < 210))      // ≈ half of ~286
    assert(byG.keySet.subsetOf(Set("g0", "g2")))              // default 0 drops the rest
    assertThrows[IllegalArgumentException] {
      Sampling.mixStrata(rows, "grp", "id", Map("g0" -> 1.5))
    }
  }

  test("upsample emits floor(w) or ceil(w) copies with mean ≈ w, deterministically") {
    val out = Sampling.upsample(rows, "id", 2.5)
    val per = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(per.values.forall(n => n == 2L || n == 3L))
    val mean = per.values.sum.toDouble / 2000.0
    assert(math.abs(mean - 2.5) < 0.06, s"mean $mean")
    // copy index is 0..n-1 per row
    val copies = out.filter($"id" === per.keys.head).select("copy").as[Int].collect().sorted
    assert(copies.toSeq == (0 until per(per.keys.head).toInt))
    // weight < 1 with a losing draw must emit zero rows, not one
    val w0 = Sampling.upsample(rows, "id", 0.0).count()
    assert(w0 == 0L)
    val w03 = Sampling.upsample(rows, "id", 0.3).groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    assert(w03.size < 900 && w03.values.forall(_ == 1L))
  }

  test("contamination is 1.0 for a benchmark copy, 0.0 for disjoint text") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // verbatim copy
      (2L, "completely different words about spark engines here"),
      (3L, "prefix tokens then the quick brown fox appears")).toDF("doc_id", "text")
    val out = Dedup.contamination(docs, "doc_id", "text", bench, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0)
    assert(out(3L) > 0.0 && out(3L) < 1.0) // shares "the quick brown" ngrams only
  }

  test("tfIdfTopK surfaces the distinctive term, not the common one") {
    val docs = Seq(
      (1L, "common common common unique1"),
      (2L, "common common unique2 unique2"),
      (3L, "common unique3 filler filler")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // "common" appears in all docs → idf = ln(1) = 0 → can never win
    assert(top == Map(1L -> "unique1", 2L -> "unique2", 3L -> "filler"))
  }

  test("weightedGroupSample: exactly k per group, repartition-invariant, zero-weight excluded") {
    val rows = (1 to 200).map(i => (i.toLong, if (i % 2 == 0) "g1" else "g2",
      if (i <= 190) i.toDouble else 0.0)).toDF("id", "grp", "w")
    val a = Sampling.weightedGroupSample(rows, "grp", "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedGroupSample(rows.repartition(13), "grp", "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(a == b, "sample must be partitioning-invariant")
    assert(a.size == 20) // 10 per group
    assert(a.forall(_ <= 190), "zero-weight rows can never be drawn")
  }

  test("weightedGroupSample favors heavy rows (statistical sanity over salts)") {
    // one group, two weight classes; across many salted draws the
    // heavy rows (weight 100) must dominate selections of the light
    // rows (weight 1)
    val rows = (1 to 100).map(i => (i.toLong, "g",
      if (i <= 50) 100.0 else 1.0)).toDF("id", "grp", "w")
    val heavyPicks = (1 to 10).map { s =>
      Sampling.weightedGroupSample(rows, "grp", "id", "w", k = 10, salt = s.toString)
        .select("id").as[Long].collect().count(_ <= 50)
    }.sum
    assert(heavyPicks >= 80, s"heavy rows picked only $heavyPicks/100 times")
  }

  test("splitAssign is exhaustive, repartition-invariant, and roughly proportional") {
    val rows = (1 to 10000).map(i => i.toLong).toDF("id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.splitAssign(rows, "id", fr)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val b = Sampling.splitAssign(rows.repartition(7), "id", fr)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a == b)
    assert(a.values.sum == 10000)
    assert(math.abs(a("train") - 8000L) < 300, a.toString)
    assert(math.abs(a("val") - 1000L) < 150 && math.abs(a("test") - 1000L) < 150)
  }

  test("temperatureMixHalf flattens toward small sources and is invariant") {
    // 3 sources of very different sizes: α = 0.5 keeps a LARGER
    // fraction of small sources than of big ones
    // sizes 6400/1600/400 → rates 0.375 / 0.75 / 1.5-clamped-to-1
    val docs = ((1 to 6400).map(i => (i.toLong, "big")) ++
      (6401 to 8000).map(i => (i.toLong, "mid")) ++
      (8001 to 8400).map(i => (i.toLong, "tiny")))
      .toDF("doc_id", "source")
    val kept = Sampling.temperatureMixHalf(docs, "source", "doc_id", 0.5)
    val rates = kept.groupBy("source")
      .agg(org.apache.spark.sql.functions.min("rate"))
      .as[(String, Double)].collect().toMap
    // rate ∝ √n/n = 1/√n → smaller sources keep a larger fraction
    assert(rates("tiny") === 1.0)   // target exceeds the source: clamp
    assert(math.abs(rates("mid") - 0.75) < 1e-6)
    assert(math.abs(rates("big") - 0.375) < 1e-6)
    // tiny kept whole; the rest ≈ rate·n (hash-draw tolerance)
    val perSrc = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(perSrc("tiny") === 400L)
    assert(math.abs(perSrc("mid") - 1200L) < 120, perSrc.toString)
    assert(math.abs(perSrc("big") - 2400L) < 200, perSrc.toString)
    // repartition-invariant membership
    val n2 = Sampling.temperatureMixHalf(docs.repartition(13), "source",
      "doc_id", 0.5).count()
    assert(n2 === kept.count())
  }

  test("pretrainOrder: positions are a per-shard bijection, stable under " +
    "repartitioning, and consistent with shardAssign") {
    val docs = (0L until 300L).toDF("doc_id")
    val out = Sampling.pretrainOrder(docs, "doc_id", nShards = 8)
      .as[(Long, Int, Int)].collect()
    assert(out.length == 300)
    // per shard: pos is exactly 1..size
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"shard $shard positions not a bijection")
    }
    // same shard as shardAssign for every key
    val shards = Sampling.shardAssign(docs, "doc_id", nShards = 8)
      .as[(Long, Int)].collect().toMap
    out.foreach { case (id, shard, _) => assert(shards(id) == shard) }
    // deterministic: identical output from a differently-partitioned input
    val out2 = Sampling.pretrainOrder(docs.repartition(7), "doc_id", nShards = 8)
      .as[(Long, Int, Int)].collect()
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
  }

  test("redactPii counts and masks emails and phones") {
    val docs = Seq(
      (1L, "write to alice.smith+x@corp.example.org or call 555-123-4567 now"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "write to <EMAIL> or call <PHONE> now")
    assert(out(2L)._2 == 0 && out(2L)._3 == 0 && out(2L)._4 == "no pii here at all")
  }

  test("mixturePlan: targets, epoch cap, deficit flags, and empty-source rows") {
    val corpus = Seq(
      (1L, "t1 t2 t3", "A"), (2L, "t4 t5 t6", "A"),
      (3L, "u1 u2 u3 u4", "B"),
      (4L, "v1 v2", "C") // no weight -> target 0, never sampled
    ).toDF("doc_id", "text", "source")
    val out = Sampling.mixturePlan(corpus, "source", "text",
        weights = Map("A" -> 0.6, "B" -> 0.2, "D" -> 0.2),
        budget = 40L, maxEpochs = 2)
      .as[(String, Long, Long, Double, Long, Double, Int, Long, Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.size === 4)
    // A: 6 avail, target floor(.6*40)=24, raw rate 4.0 CAPPED to the
    //    epoch limit 2.0 (the emitted rate is directly realizable),
    //    planned min(24, 12)=12, deficit
    assert(out("A") === (("A", 2L, 6L, 0.6, 24L, 2.0, 2, 12L, 1)))
    // B: 4 avail, target 8, rate 2.0, epochs 2, planned 8, no deficit
    assert(out("B") === (("B", 1L, 4L, 0.2, 8L, 2.0, 2, 8L, 0)))
    assert(out("C") === (("C", 1L, 2L, 0.0, 0L, 0.0, 0, 0L, 0)))
    // D: weighted but ABSENT from the corpus — must still report the
    // (0 avail, deficit) row instead of silently vanishing
    assert(out("D") === (("D", 0L, 0L, 0.2, 8L, 0.0, 0, 0L, 1)))
  }

  test("realizeMixture: capped rates materialize exactly; empty source keeps its row") {
    val corpus = Seq(
      (1L, "t1 t2 t3", "A"), (2L, "t4 t5 t6", "A"),
      (3L, "u1 u2 u3 u4", "B"),
      (4L, "v1 v2", "C")
    ).toDF("doc_id", "text", "source")
    // A: rate 5.0 capped to 2.0 -> exactly 2 copies/doc; B: 2.5 -> 2.0;
    // C: weight 0 -> 0 copies. All integral, so realized == planned.
    val out = Sampling.realizeMixture(corpus, "doc_id", "source", "text",
        weights = Map("A" -> 0.75, "B" -> 0.25), budget = 40L, maxEpochs = 2)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") === (("A", 2L, 4L, 12L, 12L, 0.0)))
    assert(out("B") === (("B", 1L, 2L, 8L, 8L, 0.0)))
    assert(out("C") === (("C", 1L, 0L, 0L, 0L, 0.0)))
    // a weighted source with no docs: planned > 0, realized 0, rel_err 1
    val missing = Sampling.realizeMixture(corpus, "doc_id", "source",
        "text", weights = Map("A" -> 0.5, "D" -> 0.5), budget = 8L,
        maxEpochs = 2)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // planned = min(target 4, avail 0 * cap) = 0; the row itself is the point
    assert(missing("D") === (("D", 0L, 0L, 0L, 0L, 0.0)))
    // fractional rates: copies per doc land in {floor, floor+1},
    // deterministically (same draws under repartitioning)
    val frac = Sampling.realizeMixture(corpus, "doc_id", "source", "text",
        weights = Map("A" -> 0.5, "B" -> 0.5), budget = 20L, maxEpochs = 4)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // A: rate 10/6 = 1.666... -> each doc 1 or 2 copies
    assert(frac("A")._3 >= 2L && frac("A")._3 <= 4L)
    val rep = Sampling.realizeMixture(corpus.repartition(3), "doc_id",
        "source", "text", weights = Map("A" -> 0.5, "B" -> 0.5),
        budget = 20L, maxEpochs = 4)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rep === frac)
  }
}
