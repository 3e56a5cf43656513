package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingestion without the full-pass schema-inference tax.
  *
  * Spark's `inferSchema=true` reads and type-parses EVERY byte twice:
  * one full pass to infer, one to load. The reference's fastest engines
  * don't (SURVEY §2 O3): polars infers from the first 100 rows
  * (`infer_schema_length`, main.rs:85-94 / notebook cells) and
  * datatable samples. At 30.3 M rows the second pass is ~half the
  * reference read-stage time (VERDICT r4 #4).
  *
  * [[readInferFast]] reproduces the sampled-inference contract
  * Spark-natively: infer on ONE data file of the directory (with
  * row-level `samplingRatio` on top), then scan the whole directory
  * with the inferred schema pinned. Inference cost drops from a full
  * pass to `1/n_files × samplingRatio` of the data; the main scan is
  * unchanged — same pushdown, same partitioning, same parallelism.
  * The trade is the same one polars makes: a type that only shows up
  * outside the sampled prefix (e.g. a stray string in a numeric
  * column) is not seen at inference time and lands as a parse-error
  * null under PERMISSIVE mode instead of widening the column. Callers
  * with adversarial inputs pass an explicit schema (q13's lane);
  * callers re-reading machine-written exports — the benchmark's case
  * and the overwhelmingly common one — get a ~2× faster read.
  */
object CsvIngest {

  /** First data file of `path` (Hadoop FS, so it works against HDFS/S3
    * at scale, not just local disk), or `path` itself if it is a file.
    */
  private def sampleFile(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) path
    else {
      val parts = fs.listStatus(p)
        .filter(s => s.isFile && s.getLen > 0 && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
        .sortBy(_.getPath.getName)
      parts.headOption.map(_.getPath.toString).getOrElse(path)
    }
  }

  def readInferFast(spark: SparkSession, path: String,
                    header: Boolean = true,
                    samplingRatio: Double = 0.05): DataFrame = {
    val schema = spark.read
      .option("header", header.toString)
      .option("inferSchema", "true")
      .option("samplingRatio", samplingRatio.toString)
      .csv(sampleFile(spark, path))
      .schema
    spark.read.option("header", header.toString).schema(schema).csv(path)
  }
}
