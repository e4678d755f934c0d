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
  * ROUND-10 FINDINGS (the bisect that motivated this tool):
  *  - the 6-query sequence did NOT reproduce the inflation at either
  *    threshold (q142 ≈ 11 s min-of-2 both ways) — the contamination
  *    needs the full 182-query suite to accumulate;
  *  - a JIT code-cache overflow hypothesis was ruled out: a FULL
  *    suite run forced back to the 240 MB default printed zero
  *    "CodeCache is full" warnings;
  *  - that same full-suite run, with the round-10 scoping of the
  *    threshold to top-k queries (TopKAgg's derived session) as the
  *    only other change, came back healthy: total 216.5 s → 154.7 s,
  *    q142 51.4 s → 9.95 s, q16 1.51 s → 0.61 s, q143 3.45 s →
  *    1.37 s — implicating cross-query heap residue from EVERY
  *    ObjectHashAggregate in the suite holding up to 4M group
  *    buffers under the round-9 session-global threshold.
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
