package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is row-for-row identical to the plain join on skewed keys") {
    // 40% of fact rows hit key 1 (the hot key)
    val fact = (1 to 5000).map(i =>
      (if (i % 5 < 2) 1L else (i % 100).toLong, i)).toDF("k", "v")
    val dim = (0L to 99L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(fact, dim, "k", saltFactor = 16)
      .select(plain.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("saltedJoin spreads a hot key across salt partitions") {
    val fact = (1 to 2000).map(i => (1L, i)).toDF("k", "v")  // ALL rows one key
    val dim = Seq((1L, "hot")).toDF("k", "name")
    val salts = fact
      .withColumn("_salt", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"k", $"v"),
        org.apache.spark.sql.functions.lit(16)))
      .select("_salt").distinct().count()
    assert(salts > 8, s"expected the hot key spread over many salts, got $salts")
    assert(Skew.saltedJoin(fact, dim, "k", 16).count() == 2000)
  }

  test("saltedDistinct equals plain countDistinct and is partition-invariant") {
    import org.apache.spark.sql.functions._
    // hot key "a": 5000 rows over 700 distinct values; "b" small
    val rows = (1 to 5000).map(i => ("a", (i % 700).toLong)) ++
      (1 to 50).map(i => ("b", (i % 7).toLong))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedDistinct(df, "k", "v", saltFactor = 16)
      .as[(String, Long)].collect().toMap
    val plain = df.groupBy("k").agg(countDistinct("v").cast("long"))
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
    assert(salted === Map("a" -> 700L, "b" -> 7L))
    val re = Skew.saltedDistinct(df.repartition(13), "k", "v", 16)
      .as[(String, Long)].collect().toMap
    assert(re === plain)
    // saltFactor 1 degenerates to the plain two-stage distinct
    assert(Skew.saltedDistinct(df, "k", "v", 1)
      .as[(String, Long)].collect().toMap === plain)
  }
}
