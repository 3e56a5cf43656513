package graft

import org.apache.spark.sql.SparkSession

/** One shared SparkSession for the whole test run (per-suite sessions
  * thrash codegen caches and dominate test time).
  */
object TestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()

  val Sf = "/root/testdata/sf0.001"
}

trait SparkTestBase {
  lazy val spark: SparkSession = TestSession.spark
  def sf: String = TestSession.Sf
}
