package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Sessions, SparkEntry}

/** Dev profiler: time named queries / print plans at a given SF.
  * Usage: runMain graft.tools.Profile <sfDir> <queryName> [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: DataFrame): Long = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1000000
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) fn(spark, sfDir).explain("formatted")
      val warm = force(fn(spark, "/root/testdata/sf0.001"))
      val t = force(fn(spark, sfDir))
      println(s"PROFILE $n warm=${warm}ms sf=${t}ms")
    }
    spark.stop()
  }
}
