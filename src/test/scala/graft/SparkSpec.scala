package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (getOrCreate — Spark
  * reuses the context across suites, keeping `sbt test` fast).
  */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local(cpus = 4, appName = "graft-test")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
