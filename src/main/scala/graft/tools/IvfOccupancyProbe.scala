package graft.tools

import graft.Sessions
import graft.llm.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 ADVICE follow-up (task 7): `lshAutoBits` now MEASURES
  * bulk-cosine spread, but IVF's cell count is still purely
  * count-derived (bounded-occupancy `n/32` cells in the mid range) —
  * is a skew-heavy corpus the analogous hazard?
  *
  * This probe builds the PRODUCTION index (`buildIvfIndex`, auto
  * sizing) over duplicate-heavy corpora at two scales and prints the
  * per-(c1,c2) occupancy distribution:
  *
  *   - BULK skew (many duplicate FAMILIES of fixed size, family count
  *     growing with the corpus — the repeated-boilerplate shape):
  *     every family collapses into one cell, but different families
  *     have different positions → different cells, so mean/p99 should
  *     stay pinned at the sizing's ~32 as the corpus grows 10×.
  *   - HOT-FAMILY skew (ONE vector whose duplicate count grows WITH
  *     the corpus — the viral-document shape): no quantizer can split
  *     identical vectors across cells, so the max cell must track the
  *     family linearly. That is a DATA property, not a sizing defect;
  *     the mitigation in this library is dedup-before-index (exact L1
  *     / SemDeDup L28), and the probe quantifies exactly how much a
  *     skipped dedup costs a probe that lands in the hot cell.
  *
  * Usage: runMain graft.tools.IvfOccupancyProbe [sfDir]
  * Prints one markdown row per (scale, corpus variant).
  */
object IvfOccupancyProbe {

  private val FamilySize = 100
  private val HotBase = 1000

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.tune(
      Sessions.builder(16, "graft-ivfocc").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dims = base.select(size(col("embedding"))).head().getInt(0)

    // ×10 by coordinate rotation — the ScaleSmoke salting contract:
    // per-copy workloads identical, cross-copy cosine at bulk level
    def tenfold(e: DataFrame): DataFrame =
      (0 until 10).map { i =>
        e.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          (if (i == 0) col("embedding")
           else expr(s"concat(slice(embedding, ${i + 1}, ${dims - i}), " +
             s"slice(embedding, 1, $i))")).as("embedding"))
      }.reduce(_ unionByName _)

    // `nFam` duplicate families of FIXED FamilySize (deterministic
    // hash-picked members, dense family indexes so the synthetic ids
    // cannot collide with the rotated-copy id ranges) + one HOT
    // family of `hot` copies
    def withDups(e: DataFrame, nFam: Int, hot: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val fams = e.orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(nFam)
        .withColumn("_f", row_number().over(
          Window.orderBy(xxhash64(col("vec_id")), col("vec_id"))))
        .crossJoin(broadcast(
          spark.range(FamilySize).select(col("id").as("_cp"))))
        .select((col("_f") * 1000L + col("_cp") + lit(2000000000L))
          .as("vec_id"), col("embedding"))
      val hotRow = e.orderBy(xxhash64(col("vec_id") + 7L), col("vec_id"))
        .limit(1)
        .crossJoin(broadcast(
          spark.range(hot).select(col("id").as("_cp"))))
        .select((col("_cp") + lit(3000000000L)).as("vec_id"),
          col("embedding"))
      e.unionByName(fams).unionByName(hotRow)
    }

    val scaleA = withDups(base, nFam = 64, hot = HotBase)
    val scaleB = withDups(tenfold(base), nFam = 640, hot = HotBase * 10)

    println("| corpus | n | cells | mean occ | p99 occ | max occ | hot-cell occ |")
    println("|---|---|---|---|---|---|---|")
    probe(spark, s"base+fams ($dir)", scaleA)
    probe(spark, "10x +10x fams, 10x hot", scaleB)
    spark.stop()
  }

  private def probe(spark: SparkSession, tag: String,
                    corpus: DataFrame): Unit = {
    val spread = corpus
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val n = spread.count()
    val path = s"/tmp/graft_ivfocc_${ProcessHandle.current().pid()}"
    Similarity.buildIvfIndex(spread, "vec_id", "embedding", path)
    val occ = spark.read.parquet(s"$path/lists")
      .groupBy(col("_c1"), col("_c2")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val cells = occ.count()
    val stats = occ.agg(avg(col("c")).as("mean"),
        expr("percentile_approx(c, 0.99)").as("p99"),
        max(col("c")).as("max")).head()
    // the hot family's cell: where the id-3000000000+ rows landed
    val hotCell = spark.read.parquet(s"$path/lists")
      .filter(col("id_b") >= 3000000000L)
      .groupBy(col("_c1"), col("_c2")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    println(f"| $tag | $n | $cells | ${stats.getDouble(0)}%.1f | " +
      s"${stats.get(1)} | ${stats.getLong(2)} | $hotCell |")
  }
}
