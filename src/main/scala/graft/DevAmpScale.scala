package graft

import org.apache.spark.sql.functions._

/** One-more-decade scaling probe for the media/archive lanes whose
  * sf0.01 -> sf0.1 time-x read above data-x (r12 verdict #3: q200
  * 4.4x, q190 3.7x, q197 3.4x, q211 2.6x at 10x data — claimed
  * fixed-cost artifacts at toy scale). The probe amplifies sf0.1's
  * documents table by UNION-with-id-offset into a tmp sf dir (the
  * lanes stage their container fixtures keyed by the dir path, so the
  * REGISTERED lane code runs unchanged against 10x the documents) and
  * measures best-of-2 per amp level. If the super-linear reads were
  * fixed costs, time-x at this decade falls toward data-x.
  *
  * Usage: runMain graft.DevAmpScale [amp] [lanes...]
  */
object DevAmpScale {
  /** Stage (idempotently, marker-keyed) the documents-x`amp` corpus
    * dir derived from `base` — shared by DevAmpScale and DevAmpBreak.
    * Returns the amp dir path.
    */
  private[graft] def ensureAmpDir(
      spark: org.apache.spark.sql.SparkSession, base: String, amp: Int): String = {
    val ampDir = s"${System.getProperty("java.io.tmpdir")}/graft_amp${amp}_sf01"
    val marker = java.nio.file.Paths.get(ampDir, "_AMP_OK")
    // v2 token: the offset scheme changed (derived, not fixed) — a
    // stale v1 amp dir in tmp must regenerate
    val ampSrcs = Seq(s"$base/documents.parquet", "amp-fixture-v2:derived-offset")
    if (!Fixtures.markerCurrent(marker, ampSrcs: _*)) {
      Fixtures.clearDir(java.nio.file.Paths.get(ampDir))
      val docs = spark.read.parquet(s"$base/documents.parquet")
      // offset derived from the corpus, not fixed (r13 ADVICE): a
      // fixed stride that ids ever reached would collide copies and
      // silently SHRINK the amplified corpus, understating time-x
      val off = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
      (0 until amp).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i * off)))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$ampDir/documents.parquet")
      Fixtures.writeMarker(marker, ampSrcs: _*)
    }
    ampDir
  }

  def main(args: Array[String]): Unit = {
    val amp = args.headOption.map(_.toInt).getOrElse(10)
    val lanes =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q196_gzip_ingest", "q200_warc_ingest", "q190_gif_frames",
               "q197_y4m_video", "q211_video_neardup")
    val base = "/root/testdata/sf0.1"
    val spark = Sessions.benchSession("graft-ampscale")
    spark.sparkContext.setLogLevel("WARN")
    val ampDir = ensureAmpDir(spark, base, amp)
    val byName = Registry.all.map(q => q.name -> q).toMap
    def bestOf2(d: String, name: String): Double = {
      val q = byName(name)
      (1 to 2).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        q.build(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    println(f"[ampscale] amp=$amp over $base (docs x$amp)")
    lanes.foreach { n =>
      val t1 = bestOf2(base, n)
      val tA = bestOf2(ampDir, n)
      println(f"[ampscale] $n%-24s base=$t1%6.2f s  amp$amp=$tA%6.2f s  time-x=${tA / t1}%5.2f  (data-x=$amp)")
    }
    spark.stop()
  }
}
