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
    val spark = Sessions.benchSession("graft-devtime")
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
