package graft

import graft.operators.{IdMapping, Splits, TopK}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

/** ScalaCheck property suite for the core invariants SURVEY §5 calls
  * out. Each trial spins Spark jobs, so trials are capped — the value
  * is the GENERATED shapes (duplicates, negatives, singletons, empty
  * groups), not the trial count.
  */
object PropertySpec extends Properties("graft") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val keyLists: Gen[List[Long]] =
    Gen.listOfN(25, Gen.chooseNum(-50L, 50L)).map(_.take(25))

  property("denseIds is a dense 0-based bijection equal to strictOrdinal") =
    Prop.forAll(keyLists.suchThat(_.nonEmpty)) { keys =>
      val df = keys.toDF("k")
      val dense = IdMapping.denseIds(df, "k", "id")
        .as[(Long, Long)].collect().sortBy(_._1)
      val strict = IdMapping.strictOrdinal(df, "k", "id")
        .as[(Long, Long)].collect().sortBy(_._1)
      val distinctKeys = keys.distinct.sorted
      val idsDense = dense.map(_._2).sorted.toList == (0L until distinctKeys.size).toList
      idsDense && dense.toList == strict.toList &&
        dense.map(_._1).toList == distinctKeys
    }

  property("foldAssign partitions each big-enough group; small groups get -1") =
    Prop.forAll(
      Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0, 999)))
        .suchThat(_.nonEmpty)) { rows =>
      val k = 3; val minRows = 4
      val df = rows.toDF("g", "payload")
      val out = Splits.foldAssign(df, "g", k, minRows)
        .select(col("g"), col("fold")).as[(Long, Int)].collect()
      val bySize = rows.groupBy(_._1).view.mapValues(_.size).toMap
      // row count preserved (a partition, not a sample)
      out.length == rows.size &&
        out.forall { case (g, f) =>
          if (bySize(g) >= minRows) f >= 0 && f < k else f == -1
        }
    }

  property("fillToK returns exactly min(k, available) rows per group, primary first") =
    Prop.forAll(
      Gen.chooseNum(1, 5),
      Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0, 30)))
    ) { (k, raw) =>
      val prim = raw.distinct.map { case (g, i) => (g, i, 10.0 + i) }
      // fallback: one shared pool per group, ids 100-119 (disjoint from primary)
      val fall = (0L to 2L).flatMap(g =>
        (100 to 119).map(i => (g, i, 1.0 + i))).toList
      val p = prim.toDF("g", "item", "score")
      val f = fall.toDF("g", "item", "score")
      val out = TopK.fillToK(p, f, "g", "item", "score", k)
        .select(col("g"), col("item")).as[(Long, Int)].collect()
      val primByG = prim.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (0L to 2L).forall { g =>
        val got = out.filter(_._1 == g).map(_._2)
        val pSet = primByG.getOrElse(g, Set.empty)
        // exactly k (fallback pool is big enough), primary items all
        // kept up to k, no duplicates
        got.length == k && got.distinct.length == k &&
          pSet.take(k).forall(i => pSet.size > k || got.contains(i))
      }
    }

  property("splitAssign is exhaustive and deterministic") =
    Prop.forAll(keyLists.suchThat(_.nonEmpty)) { keys =>
      val df = keys.distinct.toDF("k")
      val fr = Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
      val s1 = graft.llm.Sampling.splitAssign(df, "k", fr)
        .select(col("k"), col("split")).as[(Long, String)].collect().toMap
      val s2 = graft.llm.Sampling.splitAssign(df.repartition(5), "k", fr)
        .select(col("k"), col("split")).as[(Long, String)].collect().toMap
      s1 == s2 && s1.keySet == keys.distinct.toSet &&
        s1.values.forall(Set("a", "b", "c").contains)
    }

  // tiny-alphabet texts force heavy window collisions — the stress
  // shape for span merging
  private val tinyTexts: Gen[List[String]] =
    Gen.listOfN(8, Gen.chooseNum(6, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))

  property("substrDupSpans: one row per doc, coverage bounded, flags consistent") =
    Prop.forAll(tinyTexts) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.llm.Dedup.substrDupSpans(docs, "doc_id", "text", w = 5)
        .as[(Long, Long, Long, Long, Double)].collect()
      val rep = graft.llm.Dedup
        .substrDupSpans(docs.repartition(3), "doc_id", "text", w = 5)
        .as[(Long, Long, Long, Long, Double)].collect()
      out.length == texts.size &&
        out.sortBy(_._1).sameElements(rep.sortBy(_._1)) &&
        out.forall { case (_, nTok, nSpans, dupTok, frac) =>
          dupTok <= nTok && (nSpans == 0) == (dupTok == 0) &&
            (dupTok == 0 || dupTok >= 5) && frac >= 0.0 && frac <= 1.0
        }
    }

  property("mixturePlan: planned within cap, deficit iff target unreachable") =
    Prop.forAll(
      Gen.listOfN(12, Gen.zip(Gen.oneOf("A", "B", "C"), Gen.chooseNum(2, 9))),
      Gen.chooseNum(10L, 500L)) { (rows, budget) =>
      val docs = rows.zipWithIndex.map { case ((s, n), i) =>
        (i.toLong, (1 to n).map(j => s"t$j").mkString(" "), s)
      }.toDF("doc_id", "text", "source")
      val out = graft.llm.Sampling.mixturePlan(docs, "source", "text",
          weights = Map("A" -> 0.6, "B" -> 0.4), budget = budget, maxEpochs = 3)
        .as[(String, Long, Long, Double, Long, Double, Int, Long, Int)]
        .collect()
      out.forall { case (_, _, avail, _, target, rate, epochs, planned, deficit) =>
        planned <= target && planned <= avail * 3 &&
          (deficit == 1) == (target > planned) &&
          epochs <= 3 && rate >= 0.0 && rate <= 3.0
      } && out.map(_._5).sum <= budget
    }

  // multi-char words over a 2-letter alphabet: merges always exist
  private val bpeTexts: Gen[List[String]] =
    Gen.listOfN(6, Gen.chooseNum(4, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(2, 4).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf("a", "b")).map(_.mkString)))
        .map(_.mkString(" "))))

  property("BPE tokenization: every word costs between 1 symbol and its chars") =
    Prop.forAll(bpeTexts) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.llm.Bpe.tokenCounts(docs, "doc_id", "text", nMerges = 3)
        .as[(Long, Long, Long, Long, Long, Double)].collect()
      out.length == texts.size &&
        out.forall { case (_, nWords, nChars, nBpe, nOov, comp) =>
          // scoring the training corpus itself: every word in-vocab
          nBpe >= nWords && nBpe <= nChars && nOov == 0 && comp >= 1.0
        }
    }

  property("budgetSelect: never over budget; greedy by score value") =
    Prop.forAll(
      Gen.chooseNum(1L, 400L),
      Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(1L, 20L)))
    ) { (budget, rows) =>
      val df = rows.zipWithIndex
        .map { case ((s, c), i) => (i.toLong, s / 10.0, c) }
        .toDF("doc_id", "score", "cost")
      val kept = graft.llm.Selection
        .budgetSelect(df, "doc_id", "score", "cost", budget)
        .as[(Long, Double, Long)].collect()
      val keptIds = kept.map(_._1).toSet
      val all = rows.zipWithIndex.map { case ((s, c), i) => (i.toLong, s / 10.0, c.toLong) }
      val total = kept.map(_._3).sum
      // greedy at VALUE granularity: a dropped doc never outscores a
      // kept one except inside the single boundary score value
      val keptScores = kept.map(_._2).toSet
      val dropped = all.filterNot(r => keptIds.contains(r._1))
      val boundary = if (dropped.isEmpty) -1.0 else dropped.map(_._2).max
      total <= budget &&
        dropped.forall(_._2 <= boundary) &&
        kept.forall(k => k._2 >= boundary || boundary == -1.0) &&
        (if (all.map(_._3).sum <= budget) keptIds.size == all.size else true)
    }

  property("bucketPack: windows never exceed context; slots dense; all docs land") =
    Prop.forAll(
      Gen.listOfN(30, Gen.chooseNum(1, 40)).suchThat(_.nonEmpty)) { lens =>
      val ctx = 32
      val df = lens.zipWithIndex
        .map { case (l, i) => (i.toLong, "g", ("w " * l).trim) }
        .toDF("doc_id", "grp", "text")
      val out = graft.llm.Packing
        .bucketPack(df, "doc_id", "text", "grp", ctx, saltBlocks = 3)
        .as[(Long, String, Int, Int, Long, Int)].collect()
      val (over, packed) = out.partition(_._5 == -1L)
      over.forall(r => r._3 > ctx) && packed.forall(r => r._3 <= ctx) &&
        out.length == lens.size &&
        packed.groupBy(r => (r._3, r._4, r._5)).forall { case (_, rs) =>
          rs.map(_._3).sum <= ctx &&
            rs.map(_._6).sorted.toSeq == (0 until rs.length)
        }
    }

  property("wordNgrams: count is max(0, n_tokens - n + 1); each gram has n tokens") =
    Prop.forAll(
      Gen.chooseNum(1, 4),
      Gen.listOfN(6, Gen.listOfN(5, Gen.alphaLowerStr.map(_.take(3))))
    ) { (n, tokLists) =>
      val df = tokLists.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val out = df.select(col("doc_id"),
          graft.functions.TextExprs.wordNgrams(split(col("text"), " "), n).as("g"),
          size(split(col("text"), " ")).as("nt"))
        .as[(Long, Seq[String], Int)].collect()
      out.forall { case (_, grams, nt) =>
        grams.length == math.max(0, nt - n + 1) &&
          grams.forall(_.split(" ", -1).length == n)
      }
    }
}
