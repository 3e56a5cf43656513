package graft

import org.apache.spark.sql.functions._
import graft.functions.HashFns._

/** One-off probe: natural (band, key) bucket-size distribution of the
  * MinHash banded index per sf — input for choosing BandBucketCap.
  *
  * Usage: runMain graft.DevBucketProbe <sfDir> [<sfDir>...]
  */
object DevBucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.benchSession("graft-bucket-probe")
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      val sh = Tables.documents(spark, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), hashedShingles(shingles(col("toks"), 3)).as("sh"))
      val base = sh.withColumn("sig",
        graft.expressions.MinHashSig.minhashSig(col("sh")))
      val bandCols = array((0 until MinhashBands).map(b => bandKey(col("sig"), b)): _*)
      val banded = base.select(col("doc_id"),
        posexplode(bandCols).as(Seq("band", "key")))
      val sizes = banded.groupBy("band", "key").agg(count(lit(1)).as("m"))
      val top = sizes.orderBy(col("m").desc).limit(10).collect()
        .map(r => r.getLong(2)).mkString(",")
      val q = sizes.agg(max("m"), expr("percentile(m, 0.999)"),
        expr("percentile(m, 0.99)"), count(lit(1))).head()
      println(s"[bucketprobe] $d max=${q.get(0)} p999=${q.get(1)} " +
        s"p99=${q.get(2)} buckets=${q.get(3)} top10=[$top]")
    }
    spark.stop()
  }
}
