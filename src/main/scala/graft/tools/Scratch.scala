package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}
import graft.operators.Cleaning
import graft.sources.Tables

/** Throwaway stage-by-stage profiling experiments (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val r = Cleaning.cleanRatings(Tables.load(spark, dir, "lineitem"),
      "l_suppkey", "l_partkey", "l_quantity", 0, 10)
      .select(col("userId").as("_u"), col("itemId").as("_i"),
        col("rating").cast("long").as("_r")).cache()
    println(s"ratings rows = ${r.count()}")
    println(s"users = ${r.select("_u").distinct().count()}, items = ${r.select("_i").distinct().count()}")

    val a = r.toDF("_u", "item_a", "_ra")
    val b = r.toDF("_u", "item_b", "_rb")
    time("self-join only") {
      a.join(b, Seq("_u")).filter(col("item_a") =!= col("item_b"))
        .select(col("item_a"))
    }
    def pairsAgg = a.join(b, Seq("_u")).filter(col("item_a") =!= col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("_ra") * col("_rb")).cast("double").as("_dot"),
        count(lit(1)).as("_overlap"))
      .filter(col("_overlap") >= 2)

    val emb = Tables.load(spark, dir, "embeddings").cache()
    val brute = graft.llm.Similarity
      .embedCosineTopK(emb, emb, "vec_id", "embedding", 3)
      .select(col("id_a"), col("id_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    for ((bl, nt, md) <- Seq((0.15, 3, 1.2), (0.1, 5, 1.2), (0.05, 5, 1.2),
                             (0.15, 5, 1.4))) {
      val t0 = System.nanoTime()
      val approx = graft.llm.Similarity.embedLshTopK(emb, "vec_id",
          "embedding", 3, bucketLength = bl, numTables = nt, maxDistance = md)
        .select(col("id_a"), col("id_b")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val recall = brute.count(approx.contains).toDouble / brute.size
      println(f"STAGE lsh bl=$bl nt=$nt md=$md ${(System.nanoTime() - t0) / 1e9}%.2f s recall=$recall%.3f")
    }
    spark.stop()
  }
}
