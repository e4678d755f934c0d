package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch A/B attribution of embedLshTopK's verify pipeline at the
  * third decade (round 11: stages 77/85 burn ~300/410 CPU-s at ~16
  * µs/row whatever the join strategy): times each suffix of the
  * pipeline — candidates, +join1, +join2, +dot, +round, +window — so
  * the per-row cost lands on ONE operator before any fix.
  *
  * Usage: runMain graft.tools.LshVerifyProbe /tmp/graft_sf10
  */
object LshVerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(
      Sessions.builder(16, "graft-lshverify").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")

    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(embedding, (x, j) -> CAST(x * (1.0D + 0.01D * " +
        "CAST(j % 5 - 2 AS DOUBLE)) AS FLOAT))").as("embedding"))
    val all = emb.unionByName(planted)
    val par = spark.sparkContext.defaultParallelism
    val spread = all.repartition(par).localCheckpoint()
    val n = spread.count().toDouble
    val dims = spread.select(size(col("embedding"))).head().getInt(0)
    // the production sizing/planes (shared helper — round-11 ADVICE)
    val sigma = graft.llm.Similarity.measuredSigma(
      spread, "vec_id", "embedding", dims)
    val nBits = graft.llm.Similarity.lshAutoBits(n, sigma)
    val planes = graft.llm.Similarity.lshPlanes(6, nBits, dims, 42L)
    val banded = spread.select(col("vec_id"),
        posexplode(graft.functions.VectorExprs.signBands(
          col("embedding"), planes)).as(Seq("table", "bucket")))
      .localCheckpoint()
    val cands = banded.toDF("id_a", "table", "bucket")
      .join(banded.toDF("id_b", "table", "bucket"), Seq("table", "bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
      .localCheckpoint() // isolate candidate gen from the verify timing
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"VPROBE $tag rows=$c wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val vecs = spread.select(col("vec_id").as("_vid"),
      col("embedding").as("_v"),
      sqrt(graft.functions.VectorExprs.dot(col("embedding"),
        col("embedding"))).as("_n"))
    time("candidates")(cands)
    time("join1")(cands
      .join(vecs.toDF("id_a", "_va", "_na").hint("shuffle_hash"), Seq("id_a")))
    time("join12")(cands
      .join(vecs.toDF("id_a", "_va", "_na").hint("shuffle_hash"), Seq("id_a"))
      .join(vecs.toDF("id_b", "_vb", "_nb").hint("shuffle_hash"), Seq("id_b")))
    time("join12_dot")(cands
      .join(vecs.toDF("id_a", "_va", "_na").hint("shuffle_hash"), Seq("id_a"))
      .join(vecs.toDF("id_b", "_vb", "_nb").hint("shuffle_hash"), Seq("id_b"))
      .filter(graft.functions.VectorExprs.dot(col("_va"), col("_vb")) /
        (col("_na") * col("_nb")) >= -1.0))
    time("join12_dot_round")(cands
      .join(vecs.toDF("id_a", "_va", "_na").hint("shuffle_hash"), Seq("id_a"))
      .join(vecs.toDF("id_b", "_vb", "_nb").hint("shuffle_hash"), Seq("id_b"))
      .filter(round(graft.functions.VectorExprs.dot(col("_va"), col("_vb")) /
        (col("_na") * col("_nb")), 4) >= -1.0))
    time("full_window") {
      val cos = cands
        .join(vecs.toDF("id_a", "_va", "_na").hint("shuffle_hash"), Seq("id_a"))
        .join(vecs.toDF("id_b", "_vb", "_nb").hint("shuffle_hash"), Seq("id_b"))
        .withColumn("cos", round(
          graft.functions.VectorExprs.dot(col("_va"), col("_vb")) /
            (col("_na") * col("_nb")), 4))
        .select(col("id_a"), col("id_b"), col("cos"))
      cos.withColumn("rank", row_number().over(
          Window.partitionBy(col("id_a"))
            .orderBy(col("cos").desc, col("id_b"))))
        .filter(col("rank") <= 3)
    }
    spark.stop()
  }
}
