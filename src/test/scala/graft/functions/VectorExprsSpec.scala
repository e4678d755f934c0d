package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("dot matches the higher-order-function fold") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(-0.5f, 0.25f, 0.0f), Array(2.0f, 4.0f, 8.0f)))
      .toDF("id", "a", "b")
    val hof = aggregate(
      zip_with($"a".cast("array<double>"), $"b".cast("array<double>"),
        (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) => x * y),
      lit(0.0), (acc: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) => acc + v)
    val rows = df.select($"id", VectorExprs.dot($"a", $"b").as("d"), hof.as("h"))
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, d, h) => assert(d == h) }
  }

  test("dot handles mismatched lengths (common prefix) and null arrays") {
    val df = Seq(
      (1L, Some(Array(1.0, 2.0, 3.0)), Some(Array(10.0, 10.0))),
      (2L, None, Some(Array(1.0))))
      .toDF("id", "a", "b")
    val out = df.select($"id", VectorExprs.dot($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(30.0))
    assert(out(2L).isEmpty)
  }

  test("array_dot and array_decimal_dot resolve through spark.sql (GraftExtensions)") {
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vex_v")
    assert(spark.sql("SELECT array_dot(a, b) AS d FROM vex_v")
      .as[Double].head() == 11.0)
    val dd = spark.sql(
      """SELECT array_decimal_dot(CAST(a AS ARRAY<DECIMAL(18,9)>),
        |                         CAST(b AS ARRAY<DECIMAL(18,9)>)) AS d
        |FROM vex_v""".stripMargin).as[BigDecimal].head()
    assert(dd.underlying().compareTo(new java.math.BigDecimal("11")) == 0)
  }

  test("RewriteDotProducts rewrites the HOF dot pattern to array_dot (and only when safe)") {
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b,
          (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) => x * y),
        lit(0.0),
        (acc: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) => acc + v)
    // non-nullable double arrays (non-foldable input — a literal
    // relation would be constant-folded before the rule is visible)
    val df = spark.range(1, 4).select(
      array($"id".cast("double"), ($"id" * 2).cast("double")).as("a"),
      array(($"id" + 1).cast("double"), ($"id" + 2).cast("double")).as("b"))
    val q = df.select(hofDot($"a", $"b").as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("array_dot"),
      q.queryExecution.optimizedPlan.toString)
    // id=1: [1,2]·[2,3] = 8
    assert(q.as[Double].collect().min == 8.0)
    // nullable elements → HOF semantics differ (null poisons the sum):
    // the rule must NOT fire
    val dfn = spark.range(1, 3).select(
      array(when($"id" > 1, $"id".cast("double")), lit(1.0)).as("a"),
      array($"id".cast("double"), lit(2.0)).as("b"))
    val qn = dfn.select(hofDot($"a", $"b").as("d"))
    assert(!qn.queryExecution.optimizedPlan.toString.contains("array_dot"))
    assert(qn.filter($"d".isNull).count() == 1)  // id=1 row: null element
  }

  test("decimalDot is exact and equals the BigDecimal reference") {
    val rng = new scala.util.Random(3)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat),
        Array.fill(64)(rng.nextGaussian().toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    def dec(c: org.apache.spark.sql.Column) = c.cast("array<decimal(18,9)>")
    val got = df.select($"id",
        VectorExprs.decimalDot(dec($"a"), dec($"b")).as("d"))
      .as[(Long, BigDecimal)].collect().toMap
    // reference: exact BigDecimal over the same decimal(18,9) rounding
    def d9(f: Float): java.math.BigDecimal =
      new java.math.BigDecimal(f.toDouble).setScale(9, java.math.RoundingMode.HALF_UP)
    rows.foreach { case (id, a, b) =>
      val expect = a.zip(b).map { case (x, y) => d9(x).multiply(d9(y)) }
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      assert(got(id).underlying().compareTo(expect) == 0,
        s"id=$id got=${got(id)} expect=$expect")
    }
  }

  test("decimalDot survives large-magnitude coordinates (128-bit accumulation)") {
    // products up to ~1e18 unscaled would overflow a single long sum
    val df = Seq((1L,
      Array.fill(64)(java.math.BigDecimal.valueOf(999999999, 9)),  // ~0.999999999
      Array.fill(64)(java.math.BigDecimal.valueOf(999999999, 9))))
      .toDF("id", "a", "b")
    def dec(c: org.apache.spark.sql.Column) = c.cast("array<decimal(18,9)>")
    val got = df.select(VectorExprs.decimalDot(dec($"a"), dec($"b")).as("d"))
      .as[BigDecimal].head()
    val one = new java.math.BigDecimal(java.math.BigInteger.valueOf(999999999L * 999999999L), 18)
    val expect = one.multiply(java.math.BigDecimal.valueOf(64))
    assert(got.underlying().compareTo(expect) == 0)
  }

  test("argmaxDot: best row wins, exact ties break to the smallest index, null vec -> null") {
    val m = Array(
      Array(1.0, 0.0),   // c0
      Array(0.0, 1.0),   // c1
      Array(0.0, 1.0))   // c2: duplicate of c1 — tie must pick c1
    val df = Seq(
      (1L, Some(Array(3.0, 1.0))),  // argmax c0
      (2L, Some(Array(1.0, 5.0))),  // c1 and c2 tie at 5 → c1
      (3L, None: Option[Array[Double]]))
      .toDF("id", "v")
    val got = df.select($"id", VectorExprs.argmaxDot($"v", m).as("c"))
      .as[(Long, Option[Int])].collect().toMap
    assert(got(1L).contains(0) && got(2L).contains(1) && got(3L).isEmpty)
  }

  test("topKDot: descending-dot order, ties to smaller index, k clamped to matrix size") {
    val m = Array(
      Array(1.0, 0.0),
      Array(0.0, 1.0),
      Array(0.0, 1.0),
      Array(-1.0, -1.0))
    val got = Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
      .select(VectorExprs.topKDot($"v", m, 3).as("c"))
      .as[Seq[Int]].head()
    // dots: c0=1, c1=2, c2=2, c3=-3 → top3 = [1, 2, 0]
    assert(got == Seq(1, 2, 0))
    val all = Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
      .select(VectorExprs.topKDot($"v", m, 99).as("c"))
      .as[Seq[Int]].head()
    assert(all == Seq(1, 2, 0, 3))
  }

  test("agreeCount matches the HOF agreement fold and handles prefix/null") {
    val df = Seq(
      (1L, Some(Array(1L, 2L, 3L, 4L)), Some(Array(1L, 9L, 3L, 4L))),   // 3 agree
      (2L, Some(Array(5L, 5L)), Some(Array(5L, 5L))),                   // 2 agree
      (3L, Some(Array(1L, 2L, 3L)), Some(Array(1L, 2L))),               // prefix: 2
      (4L, None: Option[Array[Long]], Some(Array(1L))))                 // null → null
      .toDF("id", "a", "b")
    val hof = aggregate(
      zip_with($"a", $"b",
        (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
          when(x === y, 1).otherwise(0)),
      lit(0), (acc: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) => acc + v)
    val got = df.select($"id", VectorExprs.agreeCount($"a", $"b").as("c"), hof.as("h"))
      .as[(Long, Option[Int], Option[Int])].collect()
      .map { case (id, c, h) => id -> ((c, h)) }.toMap
    assert(got(1L)._1.contains(3) && got(2L)._1.contains(2))
    // equal-length rows: native == HOF
    assert(got(1L)._1 == got(1L)._2 && got(2L)._1 == got(2L)._2)
    assert(got(3L)._1.contains(2))
    assert(got(4L)._1.isEmpty)
  }

  test("incrementalNearDup estimate stage stays whole-stage-codegen (no CodegenFallback)") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "a b c d e f h"),
      (3L, "x y z w q r s")).toDF("id", "text")
    val batch = Seq((10L, "a b c d e f g"), (11L, "p q r s t u v"))
      .toDF("id", "text")
    val stored = graft.llm.Dedup.minHashSignatures(docs, "id", "text")
    val q = graft.llm.Dedup.incrementalNearDup(batch, "id", "text", stored)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
    assert(plan.contains("array_agree"), plan)
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1)))
      .contains((10L, 1L)))
  }

  test("unitNormalize matches the hoisted-norm column form, incl. zero and null elements") {
    val df = Seq(
      (1L, Some(Array[Option[Float]](Some(3.0f), Some(4.0f)))),            // norm 5
      (2L, Some(Array[Option[Float]](Some(0.0f), Some(0.0f)))),            // zero → NaN
      (3L, Some(Array[Option[Float]](Some(2.0f), None))),                  // null element
      (4L, None: Option[Array[Option[Float]]]))             // null array
      .toDF("id", "v")
    val got = df.select($"id", VectorExprs.unitNormalize($"v").as("u"))
      .as[(Long, Option[Seq[Option[Double]]])]
      .collect().map(r => r._1 -> r._2).toMap
    assert(got(1L).contains(Seq(Some(0.6), Some(0.8))))
    // zero vector → NaN elements (the interpreted lambda's non-ANSI
    // 0/0; under ANSI the old column form THREW here — the expression
    // keeps the total, NaN-propagating contract)
    assert(got(2L).get.forall(_.get.isNaN))
    assert(got(3L).contains(Seq(Some(1.0), None)))
    assert(got(4L).isEmpty)
    // parity with the hoisted-norm column form on nonzero rows
    val nrm = sqrt(VectorExprs.dot($"v", $"v"))
    val h = df.filter($"id" =!= 2L)
      .select($"id", transform($"v".cast("array<double>"), x => x / nrm).as("h"))
      .as[(Long, Option[Seq[Option[Double]]])]
      .collect().map(r => r._1 -> r._2).toMap
    h.foreach { case (id, hs) => assert(got(id) == hs, s"row $id") }
  }

  test("int8Quantize matches quantizeInt8's contract on edge vectors") {
    val df = Seq(
      (1L, Some(Array[Option[Float]](Some(0.5f), Some(-1.0f), Some(0.25f)))),
      (2L, Some(Array[Option[Float]](Some(0.0f), Some(0.0f)))),            // zero → zeros
      (3L, Some(Array[Option[Float]](Some(1.0f), None))),                  // null element
      (4L, Some(Array.empty[Option[Float]])))                // empty → null scale
      .toDF("id", "v")
    val q = VectorExprs.int8Quantize($"v")
    val got = df.select($"id", q.getField("scale").as("s"),
        q.getField("qvec").as("q"))
      .as[(Long, Option[Double], Seq[Option[Byte]])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(1.0), Seq(Some(64: Byte), Some(-127: Byte), Some(32: Byte)))))
    assert(got(2L) == ((Some(0.0), Seq(Some(0: Byte), Some(0: Byte)))))
    assert(got(3L) == ((Some(1.0), Seq(Some(127: Byte), None))))
    assert(got(4L) == ((None, Seq())))
  }

  test("arrayAvg equals posexplode+avg per position, incl. ragged and empty groups") {
    val df = Seq(
      ("a", Some(Array[Option[Double]](Some(1.0), Some(4.0)))),
      ("a", Some(Array[Option[Double]](Some(3.0), None, Some(9.0)))),        // ragged + null elem
      ("b", Some(Array[Option[Double]](Some(10.0)))),
      ("c", None: Option[Array[Option[Double]]]))            // null array only
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(VectorExprs.arrayAvg($"v").as("m"))
      .as[(String, Seq[Double])].collect().toMap
    assert(got("a") == Seq(2.0, 4.0, 9.0)) // pos1: only row1 counts
    assert(got("b") == Seq(10.0))
    assert(got("c") == Seq())              // no non-null arrays → empty buffer
    // oracle: the exploded form this aggregate replaces
    val oracle = df.select($"g", posexplode($"v".cast("array<double>")))
      .groupBy($"g", $"pos").agg(avg($"col").as("m"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    got.foreach { case (g, m) =>
      m.zipWithIndex.foreach { case (x, i) =>
        oracle.get((g, i)).foreach(o => assert(o == x, s"($g,$i): $o vs $x"))
      }
    }
  }

  test("signBands packs one sign bit per plane per table; scale-invariant signs") {
    val planes = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),    // table 0: 2 bits
      Array(Array(-1.0, 0.0), Array(0.0, -1.0)))  // table 1: negated
    val got = Seq((1L, Array(2.0, -3.0)), (2L, Array(200.0, -300.0)))
      .toDF("id", "v")
      .select($"id", VectorExprs.signBands($"v", planes).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    // v=(+,−): table0 bits = (1,0) → 1; table1 bits = (0,1) → 2
    assert(got(1L) == Seq(1L, 2L))
    // sign bits are scale-invariant — same buckets at 100× magnitude
    assert(got(2L) == got(1L))
  }

  test("signedProject fails loudly on elements outside decimal(18,9) " +
       "instead of emitting a plausible wrong projection") {
    val signs = Array(Array[Byte](1, 1))
    val ok = Seq((1L, Array(0.5, -0.25))).toDF("id", "v")
      .select(VectorExprs.signedProject($"v", signs).as("p"))
      .selectExpr("CAST(p[0] AS DOUBLE)").as[Double].head()
    assert(ok == 0.25)
    val e = intercept[Exception] {
      Seq((1L, Array(1.5e9, 0.0))).toDF("id", "v")
        .select(VectorExprs.signedProject($"v", signs).as("p"))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(
        _.contains("overflows decimal(18,9)"))),
      s"expected the contract-naming overflow error, got $e")
  }
}
