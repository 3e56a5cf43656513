package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop timer: run a named subset of registry queries repeatedly at a
  * given sf (same session config as Bench) — for isolating bench outliers
  * without running the whole suite.
  *
  * Usage: runMain graft.DevTime <sfDir> <reps> <name> [<name>...]
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-devtime")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Registry.all.filter(q => names.contains(q.name)).foreach { q =>
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devtime] ${q.name}: ${times.map(t => f"$t%.2f").mkString(", ")} s")
    }
    spark.stop()
  }
}
