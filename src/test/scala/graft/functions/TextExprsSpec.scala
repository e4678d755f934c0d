package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private val markers = Seq("the", "a", "and", "of", "in", "to", "is")

  test("tokenSetCount matches the size(filter(IN)) HOF form, incl. edge shapes") {
    val texts = Seq(
      "the cat and the dog",       // repeats counted per occurrence
      "THE CAT",                   // case-sensitive: 0
      "a  b",                      // doubled space -> empty token, skipped
      " a",                        // leading space -> empty first token
      "",                          // single empty token
      "of of of of")
      .toDF("text").withColumn("toks", split(col("text"), " "))
    val list = markers.map(s => s"'$s'").mkString(", ")
    val out = texts.select(
      TextExprs.tokenSetCount(col("toks"), markers).as("fast"),
      expr(s"size(filter(toks, t -> t IN ($list)))").as("hof"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.forall { case (f, h) => f == h }, out.mkString(","))
    assert(out.map(_._1).toSeq == Seq(3, 0, 1, 1, 0, 4))
  }

  test("tokenSetCount skips null elements and propagates a null array") {
    val df = Seq(
      (1, Seq[String]("the", null, "a")),
      (2, null.asInstanceOf[Seq[String]]))
      .toDF("id", "toks")
    val out = df.select(col("id"),
      TextExprs.tokenSetCount(col("toks"), markers).as("c"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toMap
    assert(out == Map(1 -> 2, 2 -> -1))
  }

  test("wordNgrams matches the transform+concat_ws HOF form on every shape") {
    val texts = Seq("a b c d", "one", "", "x  y", "p q").toDF("text")
      .withColumn("toks", split(col("text"), " "))
    for (n <- Seq(2, 3)) {
      val out = texts.select(
        TextExprs.wordNgrams(col("toks"), n).as("fast"),
        when(size(col("toks")) >= n,
          expr(s"transform(sequence(1, size(toks) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(toks, i, $n)))"))
          .otherwise(array().cast("array<string>")).as("hof"))
        .collect().map(r => (r.getSeq[String](0), r.getSeq[String](1)))
      out.foreach { case (f, h) => assert(f == h, s"n=$n: $f vs $h") }
    }
    // spot value: doubled space yields an empty middle token
    val g = texts.filter(col("text") === "x  y")
      .select(TextExprs.wordNgrams(col("toks"), 2))
      .collect()(0).getSeq[String](0)
    assert(g == Seq("x ", " y"))
  }

  test("textStats avg_token_len is unchanged by the translate rewrite on edge spacing") {
    val docs = Seq((1L, "ab  cd "), (2L, "xyz"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val stats = graft.llm.TextAnalysis.textStats(docs, "doc_id", "text")
      .select("doc_id", "avg_token_len").as[(Long, Double)].collect().toMap
    // "ab  cd ": tokens [ab,,cd,] -> 4 tokens, 4 non-space chars -> 1.0
    assert(stats(1L) == 1.0)
    assert(stats(2L) == 3.0)
    assert(stats(3L) == 1.0)
  }

  test("joinTokensExcept drops exactly the covered positions on every " +
       "edge shape (leading span, trailing span, full cover, no spans)") {
    val rows = Seq(
      // spans sorted, disjoint, inclusive — the operator contract
      (1L, Seq("a", "b", "c", "d", "e"), Seq(1L, 4L), Seq(2L, 4L)), // -> "a d"
      (2L, Seq("a", "b", "c"), Seq(0L), Seq(2L)),                   // full cover
      (3L, Seq("a", "b", "c"), Seq[Long](), Seq[Long]()),           // no spans
      (4L, Seq("x"), Seq(5L), Seq(9L)),                             // out of range
      (5L, Seq[String](), Seq[Long](), Seq[Long]())                 // empty tokens
    ).toDF("id", "toks", "ss", "es")
    val out = rows.select(col("id"),
        TextExprs.joinTokensExcept(col("toks"), col("ss"), col("es")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a d", 2L -> "", 3L -> "a b c",
      4L -> "x", 5L -> ""))
  }

  test("joinTokensExcept propagates a null array and matches the " +
       "interpreted filter+exists HOF form") {
    val rows = Seq(
      (1L, Seq("a", "b", "c", "d"), Seq(1L), Seq(2L)),
      (2L, null.asInstanceOf[Seq[String]], Seq(0L), Seq(0L)))
      .toDF("id", "toks", "ss", "es")
    val out = rows.select(col("id"),
        TextExprs.joinTokensExcept(col("toks"), col("ss"), col("es")).as("fast"),
        expr("concat_ws(' ', filter(toks, (t, i) -> " +
          "NOT exists(arrays_zip(ss, es), sp -> i BETWEEN sp.ss AND sp.es)))")
          .as("hof"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getString(2))).toSeq
    assert(out.find(_._1 == 1L).get._2 == "a d")
    assert(out.find(_._1 == 1L).get._3 == "a d")
    assert(out.find(_._1 == 2L).get._2 == null)
  }
}
