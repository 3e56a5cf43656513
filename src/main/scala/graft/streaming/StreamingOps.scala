package graft.streaming

import graft.{Q, Tables}
import graft.ops.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming lane: the SAME transform that q26 runs in batch
  * (EventOps.windowedAgg) executed as an incremental streaming query —
  * readStream over the events parquet, windowed aggregation, memory
  * sink, drained synchronously with processAllAvailable.
  *
  * q41's oracle is therefore identical to q26's: streaming and batch
  * must agree row-for-row, which is exactly Spark's unified-engine
  * claim, here made an enforced test.
  *
  * Production shape (100 TB): swap the memory sink for kafka/parquet,
  * add `.withWatermark("ts", ...)` + append mode so state is bounded;
  * see StreamingSpec for the watermark variant.
  */
object StreamingOps {

  /** events schema with ts as raw nanos (TIMESTAMP(NANOS) parquet). */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def streamingEvents(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file-stream source wants a *directory* it can monitor; the
    // testdata table is a single file, so stage it into a tmp dir (in
    // production this is the landing directory new files arrive in).
    val src = java.nio.file.Paths.get(s"$d/events.parquet")
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_stream_src_" + java.lang.Integer.toHexString(d.hashCode))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(src, dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    s.readStream
      .schema(eventsRawSchema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def streamWindowed(s: SparkSession, d: String): DataFrame = {
    val qname = "graft_stream_" + java.lang.Integer.toHexString(d.hashCode)
    val q = EventOps.windowedAgg(streamingEvents(s, d))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(qname).orderBy("wstart", "event_type")
  }

  private val streamWindowedSql =
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
       | event_type, COUNT(*) AS n,
       | ${graft.functions.Stable.dsumSql("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q41_stream_windowed", streamWindowed, Some(streamWindowedSql),
      "Structured Streaming windowed agg == batch q26"))
}
