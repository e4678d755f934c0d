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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.tune(Sessions.builder(cpus, "graft-profile").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    // by-name: queries with eager stages (iterative fixpoints, writes)
    // do real work while the DataFrame is CONSTRUCTED — the timer must
    // cover construction + action, same as Bench
    def force(df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1000000
    }
    // stage-level metrics: duration + GC per stage of the measured run
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val d = for {s <- i.submissionTime; e <- i.completionTime} yield e - s
          stages.add(f"  stage ${i.stageId}%4d ${d.getOrElse(-1L)}%7dms " +
            f"tasks=${i.numTasks}%3d gc=${i.taskMetrics.jvmGCTime}%6dms " +
            f"cpu=${i.taskMetrics.executorCpuTime / 1000000}%7dms " +
            f"run=${i.taskMetrics.executorRunTime}%7dms " +
            f"in=${i.taskMetrics.inputMetrics.recordsRead}%10d " +
            f"sh=${i.taskMetrics.shuffleReadMetrics.recordsRead}%10d " +
            f"${i.name.takeWhile(_ != '\n').take(60)}")
          // heavy stages get their graft-frame callsites — the generic
          // lambda in `name` never identifies the operator
          if ((i.numTasks == 1 && i.taskMetrics.executorRunTime > 1500) ||
              i.taskMetrics.executorRunTime > 30000)
            stages.add(i.details.split("\n").filter(_.contains("graft"))
              .take(4).mkString("        ", "\n        ", ""))
        }
      })
    // same pre-measurement hygiene as Bench: stray cached blocks and
    // warm-run garbage otherwise bill their GC to the measured run
    def sweep(): Unit = {
      // shared sweep: drops everything EXCEPT the memoized shared ANN
      // corpus (see SparkEntry.protectedRddIds / Sessions.sweep)
      graft.Sessions.sweep(spark, graft.SparkEntry.protectedRddIds)
      System.gc()
    }
    // per-operator output-row SQL metrics of the FINAL frame's executed
    // plan (SPARK_GRAFT_ROWMETRICS=1): the row volumes that never cross
    // a stage boundary — e.g. the ANN candidate join feeding its
    // same-stage partial top-k — are invisible to task metrics but
    // recorded on the join node's numOutputRows. The plan must come
    // from the EXECUTED QueryExecution: `df.write` plans a fresh copy,
    // so walking `df.queryExecution` reads never-run nodes (all
    // zeros) — a QueryExecutionListener hands us the real one.
    val lastExec = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.execution.QueryExecution]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = lastExec.set(qe)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    def rowMetrics(): Unit = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def walk(p: SparkPlan, depth: Int): Unit = {
        val r = p.metrics.get("numOutputRows").map(_.value)
        println(f"    ${"  " * depth}${p.nodeName}%-44s" +
          r.map(v => f" rows=$v%12d").getOrElse(""))
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
          case q: QueryStageExec => walk(q.plan, depth + 1)
          case _ => p.children.foreach(walk(_, depth + 1))
        }
      }
      // listener events are posted async — wait for the write's own
      // onSuccess to land before reading the reference
      Thread.sleep(1000)
      Option(lastExec.get()).foreach(qe => walk(qe.executedPlan, 0))
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) fn(spark, sfDir).explain("formatted")
      val warm = force(fn(spark, "/root/testdata/sf0.001"))
      sweep()
      stages.clear()
      if (sys.env.contains("SPARK_GRAFT_ROWMETRICS")) {
        val df = fn(spark, sfDir)
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1000000
        println(s"PROFILE $n warm=${warm}ms sf=${t}ms")
        rowMetrics()
      } else {
        val t = force(fn(spark, sfDir))
        println(s"PROFILE $n warm=${warm}ms sf=${t}ms")
      }
      if (sys.env.contains("SPARK_GRAFT_STAGES")) {
        Thread.sleep(500)
        stages.forEach(s => println(s))
      }
    }
    spark.stop()
  }
}
