package graft

import org.apache.spark.sql.DataFrame

/** Fresh-JVM isolation pass for the high-variance lanes (r14 verdict
  * #7: q216's committed BENCH_DETAIL entry read 12.4 s under
  * full-suite pressure vs 7-8 s isolated — suite heap/code-cache
  * pressure, not lane cost, and the artifact could not say so).
  * Runs ONLY the composite/streaming lanes whose suite-vs-isolated
  * gap has historically exceeded ~1.5x, with Bench's exact protocol
  * (artifact pre-pass, cache clear + gc per rep, best+median of 3),
  * and writes BENCH_ISOLATED.json — which the next full Bench run
  * embeds into BENCH_DETAIL.json as `isolated_sec`.
  *
  * Run it idle, AFTER the full Bench, from a fresh JVM:
  *   sbt 'runMain graft.BenchIsolated'
  */
object BenchIsolated {
  private[graft] val DefaultLanes = Seq(
    "q163_rank_metrics", "q174_filtered_ann", "q213_audio_clipdup",
    "q214_pipeline_composite", "q215_pipeline_increment",
    "q216_stream_pipeline_ingest", "q217_pipeline_index_disk",
    "q218_pipeline_takedown", "q219_pipeline_two_epoch",
    "q220_pipeline_lifecycle")

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val loadStart = Bench.loadAvg1m()
    val contended = loadStart > Bench.ContendedLoadAvg
    if (contended)
      System.err.println(
        f"[bench-isolated] WARNING: loadavg_start $loadStart%.2f > " +
          f"${Bench.ContendedLoadAvg}%.1f — contended; stamped")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lanes = if (args.nonEmpty) args.toSeq else DefaultLanes
    val spark = Sessions.benchSession("graft-bench-isolated")
    spark.sparkContext.setLogLevel("WARN")
    // same untimed build-artifact pre-pass as Bench
    try {
      ops.PipelineOps.persistAdmissionIndex(spark, sfDir)
      ops.PipelineOps.sharedAudited(spark, sfDir).count()
      ops.PipelineOps.sharedBaseIndex(spark, sfDir).count()
      ops.SimilarityOps.sharedSimTruth(spark, sfDir).count()
      ops.SimilarityOps.sharedRawTrain(spark, sfDir)
      ops.SimilarityOps.sharedTrainedKit(spark, sfDir)
      streaming.StreamingOps.stageSpiSlices(spark, sfDir)
      ()
    } catch { case e: Throwable =>
      System.err.println(s"[bench-isolated] prebuild: $e") }
    val byName = Registry.all.map(q => q.name -> q).toMap
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val medians = scala.collection.mutable.LinkedHashMap[String, Double]()
    lanes.filter(byName.contains).foreach { name =>
      val q = byName(name)
      try {
        val times = (1 to 3).map { _ =>
          spark.catalog.clearCache()
          System.gc()
          val t0 = System.nanoTime()
          force(q.build(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        results(name) = times.min
        medians(name) = times.sorted.apply(1)
        println(f"[bench-isolated] $name%-30s min=${times.min}%6.2f s  " +
          f"reps=(${times.map(t => f"$t%.2f").mkString(", ")})")
      } catch { case e: Throwable =>
        System.err.println(s"[bench-isolated] $name failed: $e")
        results(name) = -1; medians(name) = -1
      }
    }
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val ms = medians.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val loadEnd = Bench.loadAvg1m()
    val line =
      s"""{"queries":$qs,"median_sec":$ms,"loadavg_start":${num(loadStart)},"loadavg_end":${num(loadEnd)},"contended":$contended,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_ISOLATED.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
