package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType}

/** Source layer: named-table loading over parquet (primary), CSV and
  * JDBC (optional), plus temp-view registration so both the DataFrame
  * API and `spark.sql` entry points work.
  *
  * The reference loads every table over single-task JDBC from SQLite
  * (`ALS_model3.py:67-73` — no partitionColumn, so the whole table
  * streams through one task). Here parquet is the contract (splittable,
  * columnar, predicate/projection pushdown for free) and the JDBC
  * loader is partitioned by default — the reference's known
  * single-task-scan hazard (SURVEY §4 item 2) is fixed, not copied.
  */
object Tables {

  /** Tables shipped in the driver testdata dirs. */
  val testdataTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp columns whose parquet encoding has drifted across
    * driver testdata generations: TIMESTAMP(NANOS) (arrives as long
    * nanoseconds under `spark.sql.legacy.parquet.nanosAsLong=true`,
    * set in [[graft.Sessions]]) and plain `timestamp[us]` without a
    * UTC flag (arrives as TIMESTAMP_NTZ). `load` normalizes BOTH
    * encodings to TimestampType (micros, session-tz) so downstream
    * time functions (`window`, `date_trunc`, epoch casts) work
    * unchanged whichever generation is on disk. The session timezone
    * is pinned UTC, so NTZ→TIMESTAMP is value-identical.
    */
  val nanoTsColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  /** Parquet scan (SURVEY S2). Column pruning + filter pushdown happen
    * in Catalyst; nothing to do here beyond not materializing. The
    * timestamp normalization is a narrow projection that codegen
    * fuses into the scan — no extra pass.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    nanoTsColumns.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (!df.schema.fieldNames.contains(c)) df
      else df.schema(c).dataType match {
        case LongType =>
          // integer `div`, not `/`: the latter promotes to double, and
          // epoch-nanos (~1.7e18) exceed double's 53-bit exact range —
          // truncating after double division can be off by 1µs
          df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        case TimestampNTZType =>
          // session tz is UTC (Sessions.scala), so the instant is
          // bit-identical; this restores TimestampType for epoch math
          df.withColumn(c, col(c).cast("timestamp"))
        case _ => df
      }
    }
  }

  /** Register every testdata table as a temp view (SURVEY S6: the
    * `spark.sql` entry point the reference only used via sqlite3).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    testdataTables.foreach { n =>
      load(spark, dir, n).createOrReplaceTempView(n)
    }

  /** CSV source with explicit schema (schema inference is a full extra
    * scan — never rely on it at scale).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .schema(schema)
      .csv(path)

  /** CSV sink (SURVEY S5). The reference wrote CSV from driver-side
    * pandas (`recommendations3.py:176-177`); this stays distributed.
    * `singleFile = true` reproduces the one-file layout for small
    * exports only.
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** Parquet sink (SURVEY S3). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** JSON-lines source with explicit schema (same rule as CSV: schema
    * inference costs a full extra scan of the data — at 100 TB the
    * schema is a contract, not a discovery).
    */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines sink — the interchange format for event feeds; each
    * partition writes its own file, splittable on read.
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC source/sink: the second columnar format big deployments
    * actually mix with parquet (Hive estates). Same pushdown and
    * pruning properties; exercised by the q95 roundtrip.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Bucketed managed table (hash-bucketed by `bucketCol` into
    * `numBuckets`, sorted within buckets): the co-located-join
    * storage layout. Two tables bucketed the same way join WITHOUT any
    * Exchange — at 100 TB, pre-bucketing the fact tables on their join
    * key turns every subsequent equi-join/aggregation on that key into
    * a shuffle-free local merge (the sortBy also removes the SMJ sort).
    * Requires `saveAsTable` (bucket metadata lives in the catalog, not
    * the files); BucketingSpec asserts the Exchange-free plan.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction — the data-lake hygiene op every 100 TB
    * estate schedules: streaming sinks and over-parallel writers leave
    * thousands of KB-sized parquet files, and each one costs a task,
    * a footer read and a namenode round-trip on every downstream scan.
    * Rewrites a parquet directory into ~`targetMB`-sized files
    * (estimated from the CURRENT on-disk bytes, so compression ratio
    * is preserved) and returns (filesBefore, filesAfter).
    *
    * `sortBy` optionally range-sorts while rewriting — compaction is
    * the natural moment to lay data out for min/max row-group skipping
    * on a hot filter column.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetMB: Int = 128,
              sortBy: Seq[String] = Nil): (Int, Int) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    // recursive: a partitioned (subdirectory) layout must count and
    // size its nested files, not report 0 and fall back to one output
    def parquetFiles(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val before = parquetFiles(inPath)
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / (targetMB * 1024L * 1024L)).toInt)
    val df = spark.read.parquet(inPath)
    val out =
      if (sortBy.nonEmpty)
        df.repartitionByRange(nOut, sortBy.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sortBy.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nOut)
    out.write.mode("overwrite").parquet(outPath)
    (before.size, parquetFiles(outPath).size)
  }

  /** Partitioned JDBC scan (SURVEY S1, fixed for scale): the caller
    * must supply a numeric partition column and bounds so the read
    * fans out over `numPartitions` tasks instead of one
    * (`ALS_model3.py:69-73` reads the whole table in a single task).
    * Driver class availability is the caller's responsibility;
    * exercised end-to-end against embedded Derby (shipped in
    * /opt/spark/jars) by JdbcSpec and q127_jdbc_roundtrip.
    */
  /** JDBC sink (overwrite): the write face of S1. On a cluster each
    * task opens its own connection and inserts its partition — the
    * url must therefore point at a server-mode database; embedded
    * engines (Derby/SQLite file URLs) only work single-JVM, which is
    * exactly the local-mode test harness (JdbcSpec/q127).
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .mode("overwrite")
      .save()

  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int = 32,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .options(options)
      .load()
}
