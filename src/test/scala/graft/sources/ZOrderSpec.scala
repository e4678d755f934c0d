package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave16 places x on even bits, y on odd bits") {
    assert(ZOrder.interleave16(0xFFFFL, 0L) == 0x55555555L)
    assert(ZOrder.interleave16(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(ZOrder.interleave16(3L, 1L) == 7L) // x→bits 0,2; y→bit 1
    assert(ZOrder.interleave16(0L, 0L) == 0L)
    // z-order locality: adjacent cells in either dimension stay within
    // the same aligned quad at the matching level
    assert((ZOrder.interleave16(4L, 4L) >> 6) == (ZOrder.interleave16(7L, 7L) >> 6))
  }

  test("withZValue scales by min/max and interleaves, no driver collect") {
    val df = Seq((0L, 0L), (100L, 10L), (50L, 5L)).toDF("x", "y")
    val z = ZOrder.withZValue(df, "x", "y").orderBy(col("x")).collect()
    // x=0,y=0 → (0,0); x=100,y=10 → (65535,65535); x=50,y=5 → (32767,32767)
    assert(z(0).getAs[Long]("zval") == 0L)
    assert(z(2).getAs[Long]("zval") == ZOrder.interleave16(65535L, 65535L))
    assert(z(1).getAs[Long]("zval") == ZOrder.interleave16(32767L, 32767L))
  }

  test("z-order layout prunes files on the secondary column; a one-column sort cannot") {
    // uniform 1024×1024 grid via multiplicative hashing — no rand()
    val n = 100000
    val df = (0 until n).map { i =>
      (i.toLong, (i * 2654435761L % 1024L + 1024L) % 1024L,
        (i * 40503L % 1024L + 1024L) % 1024L)
    }.toDF("id", "x", "y")

    val base = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val dirZ = s"$base/zorder"
    val dirL = s"$base/linear"
    ZOrder.zorderWrite(df, "x", "y", dirZ, 32)
    df.repartitionByRange(32, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(dirL)

    // per-file y-extent from one read (the same min/max parquet stats
    // a scan's file pruning consults)
    def filesOverlappingY(dir: String, lo: Long, hi: Long): (Long, Long) = {
      val ext = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("y")).as("mny"), max(col("y")).as("mxy"))
      (ext.count(),
        ext.filter(col("mxy") >= lo && col("mny") <= hi).count())
    }
    val (zTotal, zHit) = filesOverlappingY(dirZ, 256L, 383L)
    val (lTotal, lHit) = filesOverlappingY(dirL, 256L, 383L)
    assert(zTotal == 32 && lTotal == 32)
    // one-column sort: every file spans the full y domain → no pruning
    assert(lHit == lTotal)
    // z-order: a 1/8 y-slice must prune away at least ~half the files
    assert(zHit <= zTotal / 2, s"z-order hit $zHit of $zTotal files")

    // the layout is lossless
    val a = spark.read.parquet(dirZ)
      .agg(count(lit(1)), sum(col("x")), sum(col("y"))).head
    val b = df.agg(count(lit(1)), sum(col("x")), sum(col("y"))).head
    assert(a == b)
  }
}
