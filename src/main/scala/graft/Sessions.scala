package graft

import org.apache.spark.sql.SparkSession

/** Single source of truth for the benchmark-lane SparkSession config —
  * Bench and DevTime must measure under IDENTICAL settings or outlier
  * investigations chase config drift instead of plans (r2 review
  * finding). Verify keeps its own leaner session (driver contract).
  */
object Sessions {
  def benchSession(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // testdata tables are single ~1-10 MB parquet files; at the
      // default 128 MB split size every scan is ONE task. Small splits
      // restore scan parallelism (a real deployment reads many files
      // and does not need this).
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
