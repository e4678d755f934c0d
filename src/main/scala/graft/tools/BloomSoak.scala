package graft.tools

import graft.Sessions
import graft.streaming.CurationStream
import org.apache.spark.sql.functions._

/** Curation-store bloom soak at the DEFAULT sidecar capacity (1<<16):
  * ingest enough distinct-doc batches to cross it, and print the
  * SCALE.md evidence row — per-batch wall before/at/after the rebuild,
  * the rebuilt capacity, the measured false-positive rate against the
  * configured target, and the per-batch probe residue (what the exact
  * anti-join actually reads: the true dups + bloom false positives,
  * never the store).
  *
  * Doc texts carry per-doc unique tokens in every 3-gram window, so
  * the near-dup index never collides across docs and the soak isolates
  * the bloom/store path (the LSH path has its own q141/q124 gates).
  *
  * Usage: runMain graft.tools.BloomSoak [nBatches] [batchSize]
  */
object BloomSoak {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(12)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.tune(Sessions.builder(cpus, "graft-bloomsoak")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val store = s"/tmp/graft_bloomsoak_${ProcessHandle.current().pid()}"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(store))
    val profiles: Seq[(String, Seq[String])] =
      Seq("en" -> Seq("the", "table", "row"), "de" -> Seq("der", "und"))
    val cfg = CurationStream.Config() // default 1<<16 capacity, 1% fpp

    def batchDf(b: Int) = spark
      .range(b.toLong * batchSize + 1, (b.toLong + 1) * batchSize + 1)
      .select(col("id").as("doc_id"),
        format_string("the quick w%da fox w%db over w%dc lazy w%dd and " +
          "w%de to w%df green w%dg in w%dh time w%di nice",
          Seq.fill(9)(col("id")): _*).as("text"),
        lit("web").as("source"))

    println(s"| batch | store rows | wall s | bloom capacity |")
    val rows = (0 until nBatches).map { b =>
      val t0 = System.nanoTime()
      CurationStream.processBatch(batchDf(b), "doc_id", "text",
        profiles, store, cfg)
        .collect() // force the lazy funnel (processBatch's one job)
      val sec = (System.nanoTime() - t0) / 1e9
      val ids = CurationStream.readBlooms(spark, store)("ids")
      println(f"| ${b + 1} | ${ids.nItems} | $sec%.1f | ${ids.capacity} |")
      (b + 1, ids.nItems, sec, ids.capacity)
    }

    val ids = CurationStream.readBlooms(spark, store)("ids")
    val absent = spark.range(1000000000L, 1000050000L)
      .select(xxhash64(col("id")).as("h")).as[Long].collect()
    val fp = absent.count(ids.bf.mightContainLong)
    val oneDup = ((nBatches.toLong * batchSize + 1) to
      (nBatches.toLong * batchSize + batchSize)) :+ 5L
    val residue = oneDup.toDF("doc_id")
      .select(xxhash64(col("doc_id")).as("h")).as[Long].collect()
      .count(ids.bf.mightContainLong)
    val crossed = rows.find(_._4 > cfg.bloomCapacity)
    println(f"store ${ids.nItems} ids; capacity ${ids.capacity} " +
      s"(crossed ${cfg.bloomCapacity} at batch ${crossed.map(_._1).getOrElse(-1)})")
    println(f"measured fpp ${fp.toDouble / absent.length}%.4f " +
      f"(target ${cfg.bloomFpp}%.2f, 50k absent probes)")
    println(s"1-dup batch of ${batchSize + 1}: exact anti-join reads " +
      s"$residue bloom-positive rows (store ${ids.nItems})")
    spark.stop()
  }
}
