package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compact rewrites a many-small-files directory into few files, rows intact") {
    val in = "/tmp/graft_compact_in"
    val out = "/tmp/graft_compact_out"
    val df = (1 to 20000).map(i => (i.toLong, s"row_$i", i * 1.5)).toDF("id", "s", "v")
    df.repartition(64).write.mode("overwrite").parquet(in) // the small-files mess
    val (before, after) = Tables.compact(spark, in, out, targetMB = 64)
    assert(before == 64, s"expected 64 input files, got $before")
    assert(after <= 2, s"expected ~1 compacted file, got $after")
    val back = spark.read.parquet(out)
    assert(back.count() == 20000)
    assert(back.agg(sum($"id")).as[Long].head() == (1 to 20000).map(_.toLong).sum)
  }

  test("compact sizes a partitionBy (subdirectory) layout from its nested files") {
    val in = "/tmp/graft_compact_pin"
    val out = "/tmp/graft_compact_pout"
    (1 to 5000).map(i => (i.toLong, s"g${i % 4}", i * 2.0)).toDF("id", "g", "v")
      .repartition(8).write.mode("overwrite").partitionBy("g").parquet(in)
    val (before, after) = Tables.compact(spark, in, out, targetMB = 64)
    assert(before >= 8, s"nested files not counted: before=$before")
    assert(after >= 1 && after <= 2, s"got $after output files")
    assert(spark.read.parquet(out).count() == 5000)
  }

  test("compact with sortBy lays rows out range-sorted for row-group skipping") {
    val in = "/tmp/graft_compact_sin"
    val out = "/tmp/graft_compact_sout"
    (1 to 10000).map(i => ((i * 7919) % 10000L, i)).toDF("k", "p")
      .repartition(16).write.mode("overwrite").parquet(in)
    Tables.compact(spark, in, out, targetMB = 64, sortBy = Seq("k"))
    // within each output file rows must be non-decreasing in k
    val viol = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .withColumn("prev", lag($"k", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"f").orderBy(monotonically_increasing_id())))
      .filter($"prev".isNotNull && $"prev" > $"k")
    assert(viol.isEmpty)
  }
}
