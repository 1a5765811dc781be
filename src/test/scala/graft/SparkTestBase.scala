package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM, reused). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", cpus = 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftSession.init(s)
  }
  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  def sfDir: String = SparkTestBase.sfDir
  def table(name: String): DataFrame = GraftSession.table(spark, sfDir, name)
}
