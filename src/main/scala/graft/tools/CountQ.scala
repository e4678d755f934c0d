package graft.tools
import graft.{Sessions, SparkEntry}
object CountQ {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS","16").toInt, "graft-countq").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.tail; q = args.head) {
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(s"COUNT $q $dir $n")
    }
    spark.stop()
  }
}
