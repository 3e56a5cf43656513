package graft

import graft.sources.CsvIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampled single-file CSV schema inference (the polars
  * infer_schema_length contract): same schema and same values as
  * Spark's full-pass inference on machine-written exports, at a
  * fraction of the inference cost (q125's lane; Bench stage_read).
  */
class CsvIngestSpec extends AnyFunSuite with SparkTestBase {

  private def writeCsv(name: String): String = {
    val out = java.nio.file.Files.createTempDirectory(name).toString
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity",
              "l_extendedprice", "l_shipdate", "l_returnflag")
      .repartition(4) // several part files: inference must pick ONE
      .write.mode("overwrite").option("header", "true").csv(out)
    out
  }

  test("fast inference matches full-pass inference: schema and values") {
    val dir = writeCsv("graft_csvingest")
    val full = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    val fast = CsvIngest.readInferFast(spark, dir)
    assert(fast.schema == full.schema,
      s"fast=${fast.schema.treeString}\nfull=${full.schema.treeString}")
    val key = Seq(col("l_orderkey"), col("l_linenumber"))
    assert(fast.orderBy(key: _*).collect().map(_.toSeq.toString).toSeq ==
           full.orderBy(key: _*).collect().map(_.toSeq.toString).toSeq)
  }

  test("single-file path (not a directory) works") {
    val dir = writeCsv("graft_csvingest_one")
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .head.getAbsolutePath
    val df = CsvIngest.readInferFast(spark, part)
    assert(df.count() > 0)
    assert(df.schema.fieldNames.contains("l_extendedprice"))
  }

  test("inference skips _SUCCESS/hidden files when picking the sample") {
    val dir = writeCsv("graft_csvingest_succ")
    // Spark's own writer leaves _SUCCESS in the dir — readInferFast must
    // not try to infer from it (empty file → empty schema)
    assert(new java.io.File(dir, "_SUCCESS").exists())
    val df = CsvIngest.readInferFast(spark, dir)
    assert(df.schema.length == 6)
  }
}
