package graft.tools

import graft.{Sessions, SparkEntry}

/** Targeted bench-contamination bisect (round-10 task 1).
  *
  * The round-9 suite measured q142_pagerank at 51.4 s min-of-2 while
  * an isolated run measures ~8 s; q16/q143/q121/q144/q172 inflated the
  * same way. Prime suspect: the round-9 session-global
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold = 4Mi`,
  * which lets Object-agg queries retain millions of group buffers
  * on-heap and may leave the old gen pressured for every query after.
  *
  * This tool replays a short suspect→victim sequence inside ONE
  * session with the SAME hygiene as Bench (sweep + System.gc between
  * reps, min-of-2) and the threshold taken from `GRAFT_OHA_THRESHOLD`
  * (unset → Spark default 128). Compare:
  *
  *   GRAFT_OHA_THRESHOLD=4194304 sbt "runMain graft.tools.BisectBench"
  *   sbt "runMain graft.tools.BisectBench"
  *
  * Usage: runMain graft.tools.BisectBench [queries-csv]
  */
object BisectBench {
  def main(args: Array[String]): Unit = {
    val queries = args.headOption
      .getOrElse("q125_ivf_recall,q137_bm25,q141_incremental_dedup,q142_pagerank,q143_bigram_lm,q16_pivot")
      .split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.tune(Sessions.builder(cpus, "graft-bisect").getOrCreate())
    sys.env.get("GRAFT_OHA_THRESHOLD") match {
      case Some(v) =>
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
      case None =>
        spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[bisect] threshold = " + spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"))

    // warm-up like Bench
    queries.foreach { q =>
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"[bisect] warmup $q failed: ${e.getMessage}") }
    }
    val results = queries.map { q =>
      val runs = (1 to 2).map { _ =>
        Sessions.sweep(spark, SparkEntry.protectedRddIds)
        System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val r = f"$q min=${runs.min}%.2f reps=${runs.map(x => f"$x%.2f").mkString(",")}"
      println(s"[bisect] $r")
      r
    }
    println("[bisect] DONE\n" + results.mkString("\n"))
    spark.stop()
  }
}
