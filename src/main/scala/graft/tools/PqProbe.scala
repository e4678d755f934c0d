package graft.tools

import graft.Sessions
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** IVF-PQ vs int8-IVF size/recall/serve probe (the SCALE.md evidence
  * for X147): builds both persisted indexes on a testdata embeddings
  * table, measures planted recall (perturbed copies as queries, the
  * q168/q237 gate shape), serve wall (min-of-2), and prints the index
  * paths so the driver-side footer reader can compare per-column scan
  * bytes.
  *
  * Usage: runMain graft.tools.PqProbe [sfDir] [k] [nProbe]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(3)
    val nProbe = args.lift(2).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.tune(
      Sessions.builder(cpus, "graft-pq-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    val Offset = 1000000L
    val emb = Similarity.prepareUnit(
      graft.sources.Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding")),
      "vec_id", "embedding").localCheckpoint()
    val queries = Similarity.prepareUnit(
      graft.sources.Tables.load(spark, sfDir, "embeddings")
        .select((col("vec_id") + Offset).as("vec_id"),
          expr("transform(embedding, (x, j) -> CAST(x * (1.0D + 0.01D * " +
            "CAST(j % 5 - 2 AS DOUBLE)) AS FLOAT))").as("embedding")),
      "vec_id", "embedding").localCheckpoint()
    val n = emb.count()
    println(s"corpus: $n vectors from $sfDir")

    val pid = ProcessHandle.current().pid()
    val pathQ = s"/tmp/graft_pqprobe_int8_$pid"
    val pathP = s"/tmp/graft_pqprobe_pq_$pid"
    val tb = System.nanoTime()
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", pathQ)
    val buildQ = (System.nanoTime() - tb) / 1e9
    val tp = System.nanoTime()
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", pathP)
    val buildP = (System.nanoTime() - tp) / 1e9
    println(f"build: int8 $buildQ%.1f s, pq $buildP%.1f s")

    def serve(tag: String,
              run: () => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val found = run()
          .filter(col("id_b") === col("id_a") - Offset).count()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, found)
      }
      val (sec, found) = times.minBy(_._1)
      println(f"$tag: recall $found/$n in $sec%.1f s (min of 2)")
    }
    serve("int8", () => Similarity.searchIvfIndex(
      spark, pathQ, queries, "vec_id", "embedding", k, nProbe))
    serve("pq  ", () => Similarity.searchIvfPqIndex(
      spark, pathP, queries, "vec_id", "embedding", k, nProbe))
    println(s"paths: int8=$pathQ/lists pq=$pathP/lists")
    spark.stop()
  }
}
