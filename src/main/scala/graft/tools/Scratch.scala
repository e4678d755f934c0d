package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Sessions

/** Throwaway stage-level experiments (not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"SCRATCH $label ${(System.nanoTime() - t0) / 1000000}ms"); r
    }

    val idCol = "vec_id"; val vecCol = "embedding"
    val bitsPerTable = 8; val numTables = 6; val seed = 42L
    val dims = 64
    val rng = new scala.util.Random(seed)
    def plane() = array((0 until dims).map(_ => lit(rng.nextGaussian())): _*)
    def doubleDot(v: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =
      graft.functions.VectorExprs.dot(v, p)
    val buckets = (0 until numTables).map { t =>
      val bits = (0 until bitsPerTable).map { j =>
        when(doubleDot(col(vecCol), plane()) > 0, lit(1L << j)).otherwise(lit(0L))
      }
      struct(lit(t).as("table"), bits.reduce(_ + _).as("bucket"))
    }
    val banded = emb
      .select(col(idCol), col(vecCol), explode(array(buckets: _*)).as("b"))
      .select(col(idCol), col(vecCol), col("b.table"), col("b.bucket"))
    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    timed("banded_force")(force(banded))
    timed("banded_force2")(force(banded))
    val left = banded.toDF("id_a", "_va", "table", "bucket")
    val right = banded.toDF("id_b", "_vb", "table", "bucket")
    val joined = left.join(right, Seq("table", "bucket"))
      .filter(col("id_a") =!= col("id_b"))
    timed("join_force")(force(joined))
    val cands = joined.select(col("id_a"), col("id_b"), col("_va"), col("_vb"))
      .dropDuplicates("id_a", "id_b")
    timed("cands_force")(force(cands))
    val cos = cands.withColumn("cos", round(
      doubleDot(col("_va"), col("_vb")) /
        (sqrt(doubleDot(col("_va"), col("_va"))) *
         sqrt(doubleDot(col("_vb"), col("_vb")))), 4))
    timed("cos_force")(force(cos))
    val ranked = cos.withColumn("rank",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))))
      .filter(col("rank") <= 3)
      .select(col("id_a"), col("id_b"), col("cos"), col("rank"))
    timed("ranked_force")(force(ranked))
    spark.conf.set("spark.sql.window.group.limit.threshold", "-1")
    timed("ranked_noWGL_force")(force(ranked))
    spark.conf.set("spark.sql.window.group.limit.threshold", "1000")
    // variant: drop vectors before the window
    val cosSlim = cands.withColumn("cos", round(
      doubleDot(col("_va"), col("_vb")) /
        (sqrt(doubleDot(col("_va"), col("_va"))) *
         sqrt(doubleDot(col("_vb"), col("_vb")))), 4))
      .select(col("id_a"), col("id_b"), col("cos"))
    val rankedSlim = cosSlim.withColumn("rank",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))))
      .filter(col("rank") <= 3)
    timed("rankedSlim_force")(force(rankedSlim))
    spark.stop()
  }
}
