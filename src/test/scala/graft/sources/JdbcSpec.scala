package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S1 end-to-end against embedded Derby (the JDBC driver Spark ships
  * in /opt/spark/jars for its Hive metastore): sink writes a table,
  * the partitioned source reads it back fanned out over N tasks with
  * rows intact. Round 3 left S1 untested for lack of a driver jar;
  * Derby closes that gap without adding a dependency.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.system.home", "/tmp")
  private def freshUrl(tag: String): String =
    s"jdbc:derby:/tmp/graft_jdbc_${tag}_${ProcessHandle.current().pid()};create=true"

  test("jdbc sink + partitioned read roundtrip, fanned out over numPartitions tasks") {
    val url = freshUrl("rt")
    val src = (0L until 100L).map(i => (i, s"name_$i", i % 7)).toDF("id", "name", "grp")
    Tables.writeJdbc(src, url, "t_rt")
    val back = Tables.jdbc(spark, url, "t_rt", "id",
      lowerBound = 0, upperBound = 100, numPartitions = 5)
    assert(back.rdd.getNumPartitions == 5,
      s"read did not fan out: ${back.rdd.getNumPartitions} partitions")
    assert(back.count() == 100)
    // every row survives the round trip, no bound drops an edge row
    assert(back.select($"id", $"name", $"grp").except(src).isEmpty &&
      src.except(back.select($"id", $"name", $"grp")).isEmpty)
  }

  test("partition bounds are stride hints, not filters: out-of-bounds rows still arrive") {
    val url = freshUrl("ob")
    (0L until 50L).map(i => (i, i * 2.5)).toDF("id", "v")
      .write.format("jdbc").option("url", url).option("dbtable", "t_ob")
      .mode("overwrite").save()
    val back = Tables.jdbc(spark, url, "t_ob", "id",
      lowerBound = 10, upperBound = 20, numPartitions = 3)
    assert(back.count() == 50, "rows outside [lowerBound, upperBound) were dropped")
  }

  test("overwrite mode replaces the table contents") {
    val url = freshUrl("ow")
    Tables.writeJdbc(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), url, "t_ow")
    Tables.writeJdbc(Seq((9L, "z")).toDF("id", "s"), url, "t_ow")
    val back = Tables.jdbc(spark, url, "t_ow", "id", 0, 10, numPartitions = 2)
    assert(back.count() == 1 && back.select($"s").as[String].head() == "z")
  }
}
