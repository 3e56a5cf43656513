package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's read-only parquet testdata (TESTDATA.md).
  * All queries take an `sfDir` like /root/testdata/sf0.01 and read the
  * star-schema tables from it. Parquet scans are columnar + vectorized;
  * Catalyst pushes filters/projections into the scan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) across testdata
    * generations. Spark's vectorized reader rejects NANOS
    * ([PARQUET_TYPE_ILLEGAL]) unless legacy.parquet.nanosAsLong surfaces
    * it as a raw Long (a no-op for micros columns), and the
    * un-adjusted micros variant arrives as TIMESTAMP_NTZ. Probe the
    * footer-derived schema and normalize every generation to plain
    * TimestampType so downstream event-time code (unix_micros, window,
    * watermarks, java.sql.Timestamp encoders) sees one type:
    *  - Long = raw nanos → floor-divide to micros with integer `div`
    *    (a double round-trip would lose ns precision — exactly DuckDB's
    *    ns→us truncation, so oracle timestamps agree);
    *  - TIMESTAMP_NTZ → cast; the session timezone is pinned to UTC
    *    everywhere (Sessions/Verify/Bench/tests), so wall-clock values
    *    are preserved bit-for-bit and match DuckDB's naive timestamps;
    *  - TIMESTAMP passes through untouched.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
