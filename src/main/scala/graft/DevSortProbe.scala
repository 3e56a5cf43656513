package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only decomposition of the ScaleSmoke sort stage (r7 #5): time
  * the pieces — cached scan, sortWithinPartitions (no exchange),
  * range exchange alone, full orderBy — to see where the 2.4 s goes.
  * Not part of the driver contract; run by hand.
  */
object DevSortProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sort-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.execution.rangeExchange.sampleSizePerPartition", "400")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(name: String)(f: => Unit): Unit = {
      val ts = (0 to 3).map { _ => System.gc(); time(f) }
      println(f"[probe] $name%-28s ${ts.drop(1).sorted.apply(1)}%.3f  (all: ${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_diabetes_csv"
    val table = graft.sources.CsvIngest.readInferFast(spark, tmp).cache()
    table.count()

    med3("scan only")(force(table))
    med3("sortWithinPartitions")(force(table.sortWithinPartitions(col("Age").desc)))
    med3("repartitionByRange")(force(table.repartitionByRange(32, col("Age").desc)))
    med3("orderBy (full)")(force(table.orderBy(col("Age").desc)))
    med3("orderBy 64 parts")(force(table.repartitionByRange(64, col("Age").desc)
      .sortWithinPartitions(col("Age").desc)))
    spark.stop()
  }
}
