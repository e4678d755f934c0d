package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (0L until 20000L).map(i => (i, i % 997)).toDF("id", "k")
  private lazy val dim = (0L until 997L).filter(_ % 13 == 0)
    .map(k => (k, s"d$k")).toDF("k", "name")

  test("semiJoin equals the plain left-semi join exactly") {
    val viaBloom = BloomJoin.semiJoin(fact, "k", dim, "k")
      .select(col("id")).as[Long].collect().sorted
    val exact = fact.join(dim.select(col("k")), Seq("k"), "left_semi")
      .select(col("id")).as[Long].collect().sorted
    assert(viaBloom.sameElements(exact))
    assert(exact.nonEmpty)
  }

  test("prefilter passes a superset with a bounded false-positive rate") {
    val pre = BloomJoin.prefilterOnly(fact, "k", dim, "k").count()
    val exact = fact.join(dim.select(col("k")), Seq("k"), "left_semi").count()
    assert(pre >= exact)
    // 1% fpp on the non-matching population, wide margin for variance
    val nonMatching = fact.count() - exact
    assert(pre - exact <= math.max(50L, (nonMatching * 0.05).toLong),
      s"pre=$pre exact=$exact")
  }

  test("probe is a codegen'd scan-side predicate, not a join") {
    // a real file scan — a LocalRelation would let the optimizer fold
    // the predicate away before the plan shows it
    val dirF = java.nio.file.Files.createTempDirectory("graft_bloom_").toString
    fact.write.mode("overwrite").parquet(dirF)
    val factFile = spark.read.parquet(dirF)
    val plan = BloomJoin.prefilterOnly(factFile, "k", dim, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(500))
    assert(!plan.toLowerCase.contains("join"))
  }

  test("string keys: semiJoin equals the exact semi-join (hash-both-sides)") {
    // regression: probing cast("long") on a string key yields NULL and
    // the null-intolerant predicate silently dropped EVERY fact row;
    // both sides now go through xxhash64 so any key type works
    val factS = (0 until 5000).map(i => (i.toLong, s"k${i % 311}"))
      .toDF("id", "k")
    val dimS = (0 until 311).filter(_ % 7 == 0).map(k => (s"k$k", k))
      .toDF("k", "v")
    val viaBloom = BloomJoin.semiJoin(factS, "k", dimS, "k")
      .select(col("id")).as[Long].collect().sorted
    val exact = factS.join(dimS.select(col("k")), Seq("k"), "left_semi")
      .select(col("id")).as[Long].collect().sorted
    assert(exact.nonEmpty)
    assert(viaBloom.sameElements(exact))
  }

  test("empty dim prunes everything; null fact keys never match") {
    val emptyDim = dim.filter(col("k") < 0)
    assert(BloomJoin.semiJoin(fact, "k", emptyDim, "k").count() == 0L)
    val factWithNulls = Seq[(java.lang.Long, java.lang.Long)](
      (1L, null), (2L, 0L)).toDF("id", "k")
    val out = BloomJoin.semiJoin(factWithNulls, "k", dim, "k")
      .select(col("id")).as[Long].collect()
    assert(out.toSeq == Seq(2L))
  }
}
