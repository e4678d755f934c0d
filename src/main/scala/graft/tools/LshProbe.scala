package graft.tools

import graft.Sessions
import graft.llm.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe behind the round-11 third-decade LSH finding
  * (q124 16.9×, q209 34.5× at sf1→sf10): reproduces
  * `embedLshTopK`'s exact banding (same auto-bits, same seeded
  * hyperplanes) and prints, per corpus and dim:
  *
  *   n, bits, candidate pairs Σ_{table,bucket} C(c,2),
  *   pairs/n (the linearity check), and the top bucket sizes
  *
  * so the superlinear term can be attributed to occupancy skew vs
  * bulk-cosine spread BEFORE any fix is engineered (the round-9/10
  * measure-first discipline).
  *
  * Usage: runMain graft.tools.LshProbe <sfDir|/tmp/graft_sf1|_sf10> [projDim]
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(
      Sessions.builder(16, "graft-lshprobe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- args.filter(_.startsWith("/"))) {
      val emb = graft.sources.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val planted = emb.select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, j) -> CAST(x * (1.0D + 0.01D * " +
          "CAST(j % 5 - 2 AS DOUBLE)) AS FLOAT))").as("embedding"))
      val all = emb.unionByName(planted)
      probe(spark, "raw64", all)
      val projDim = args.find(a => !a.startsWith("/")).map(_.toInt)
      projDim.foreach { d =>
        val proj = Similarity.randomProject(all, "vec_id", "embedding",
            outDim = d, inDim = 64, seed = 42)
          .select(col("vec_id"),
            col("proj").cast("array<float>").as("embedding"))
        probe(spark, s"proj$d", proj)
      }
    }
    spark.stop()
  }

  private def probe(spark: org.apache.spark.sql.SparkSession, tag: String,
                    emb: DataFrame): Unit = {
    val par = spark.sparkContext.defaultParallelism
    val spread = emb.repartition(par).localCheckpoint()
    val n = spread.count().toDouble
    val dims = spread.select(size(col("embedding"))).head().getInt(0)
    // the PRODUCTION sizing and plane generation, not a copy (round-11
    // ADVICE: a third hand-copy of the formula desynchronizes silently)
    val sigma = Similarity.measuredSigma(spread, "vec_id", "embedding", dims)
    val nBits = Similarity.lshAutoBits(n, sigma)
    val numTables = 6
    val planes = Similarity.lshPlanes(numTables, nBits, dims, 42L)
    val banded = spread.select(col("vec_id"),
        posexplode(graft.functions.VectorExprs.signBands(
          col("embedding"), planes)).as(Seq("_table", "_bucket")))
    val occ = banded.groupBy(col("_table"), col("_bucket"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val stats = occ.agg(
      sum((col("c") * (col("c") - 1) / 2).cast("long")).as("cand_pairs"),
      max(col("c")).as("max_bucket"),
      count(lit(1)).as("n_buckets")).head()
    val top = occ.orderBy(col("c").desc).limit(8)
      .select(col("c")).collect().map(_.getLong(0)).mkString(",")
    val cand = stats.getLong(0)
    println(f"LSHPROBE $tag n=${n.toLong} bits=$nBits sigma=$sigma%.4f cand=$cand " +
      f"cand_per_n=${cand / n}%.1f max_bucket=${stats.getLong(1)} " +
      f"buckets=${stats.getLong(2)} top8=$top")
  }
}
