package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pruning-liveness probe for the persisted admission index at
  * MEASURED deployment bucket counts (r14 verdict #1: at the bench sf
  * the kb ladder floors at 8, every batch spans all buckets, and
  * "pruned" degenerates to a full-index read — a fixture-scale
  * artifact the lane decade factor cannot separate from a layout
  * flaw). This harness builds indexes of synthetic signatures at
  * 50 k / 500 k / 5 M docs (the ladder yields kb = 20 / 200 / 2000),
  * probes each with the SAME fixed-size ingest batch through the
  * registered probeAdmissionIndex, and reports:
  *   - files read (the scan's own numFiles metric) vs files on disk,
  *   - probe wall-clock (best of 3).
  * The 100 TB claim being tested: probe cost tracks the BATCH
  * (files-read fraction falls as the corpus grows; rows read converge
  * to keys x ladder-constant bucket size), never the corpus.
  *
  * Usage: runMain graft.DevIdxPrune [batchDocs] [scales...]
  */
object DevIdxPrune {
  import graft.ops.PipelineOps

  /** Deterministic synthetic signatures: 16 xxhash64-derived longs per
    * doc — unique per doc (realistic key dispersion; amp-style text
    * copies would collapse distinct keys and understate coverage).
    */
  private def synthSigs(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(col("id").as("doc_id"),
      array((0 until graft.functions.HashFns.MinhashK).map(i =>
        // bounded to [0, MinhashP) like real signature values — bandKey
        // folds 4 values via acc*31+x, which only stays inside a long
        // for prime-bounded inputs (full-range xxhash64 overflows ANSI)
        pmod(xxhash64(col("id"), lit(i)),
          lit(graft.functions.HashFns.MinhashP))): _*).as("sig"))

  def main(args: Array[String]): Unit = {
    val batchDocs = args.headOption.map(_.toInt).getOrElse(50)
    val scales: Seq[Long] =
      if (args.length > 1) args.drop(1).toSeq.map(_.toLong)
      else Seq(50000L, 500000L, 5000000L)
    val spark = Sessions.benchSession("graft-idxprune")
    spark.sparkContext.setLogLevel("WARN")

    def parquetFiles(p: java.io.File): Seq[java.io.File] =
      Option(p.listFiles()).toSeq.flatten.flatMap {
        case d if d.isDirectory => parquetFiles(d)
        case f if f.getName.endsWith(".parquet") => Seq(f)
        case _ => Nil
      }

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }

    println(s"[idxprune] fixed ingest batch = $batchDocs docs; ladder knee = 2500")
    scales.foreach { n =>
      val kb = PipelineOps.bucketsFor(n)
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_idxprune_$n"
      val marker = java.nio.file.Paths.get(dir, "_FIXTURE_OK")
      val srcs = Seq(s"idxprune-v1:n$n-kb$kb")
      if (!Fixtures.markerCurrent(marker, srcs: _*)) {
        Fixtures.clearDir(java.nio.file.Paths.get(dir))
        PipelineOps.writeAdmissionIndex(synthSigs(spark, n), dir, kb)
        Fixtures.writeMarker(marker, srcs: _*)
      }
      val totalFiles = parquetFiles(new java.io.File(dir)).size
      // the probe batch: re-submissions of every n/batchDocs-th doc —
      // same batch CONTENT at every scale (ids 0, n/batch, ... differ,
      // but sigs are id-derived; sample the SAME ids at every scale so
      // the batch is literally identical)
      val probeBatch = synthSigs(spark, batchDocs.toLong)
        .select((col("doc_id") + 900000000L).as("doc_id"), col("sig"))
        .localCheckpoint(true)
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        val probe = PipelineOps.probeAdmissionIndex(spark, dir, probeBatch)
        val qe = probe.queryExecution
        val t0 = System.nanoTime()
        // collect, not a noop write: the writer builds a SEPARATE
        // QueryExecution, leaving qe's metrics untouched (output is
        // doc_ids — driver-safe at any scale)
        probe.collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val files = scans(qe.executedPlan)
          .filter(_.relation.location.rootPaths.exists(
            _.toString.contains(s"graft_idxprune_$n")))
          .map(_.metrics("numFiles").value).sum
        (sec, files)
      }
      val runs = (1 to 3).map(_ => once())
      val best = runs.map(_._1).min
      val files = runs.head._2
      println(f"[idxprune] n=$n%8d kb=$kb%5d files_read=$files%5d/$totalFiles%-5d " +
        f"(${100.0 * files / math.max(totalFiles, 1)}%5.1f%%)  probe_sec=$best%6.3f  " +
        f"strict_subset=${files > 0 && files < totalFiles}")
      // WRITE path at the same scale: fold the batch in, tombstone it
      // back out (net row set unchanged — fold==rebuild and delete
      // exactness are spec-proven, so the fixture stays pristine).
      // q218's tombstone stage read 1.70x at the toy kb floor because
      // a delete there touches ALL buckets; here the touched set must
      // track the batch and the wall-clock must stay ~flat in n.
      val totalBuckets = kb * graft.functions.HashFns.MinhashBands
      val nBefore = spark.read.parquet(dir).count()
      val t0f = System.nanoTime()
      val foldTouched = PipelineOps.foldIntoAdmissionIndex(spark, dir, probeBatch)
      val foldSec = (System.nanoTime() - t0f) / 1e9
      val t0d = System.nanoTime()
      val delTouched = PipelineOps.deleteFromAdmissionIndex(spark, dir, probeBatch)
      val delSec = (System.nanoTime() - t0d) / 1e9
      val nAfter = spark.read.parquet(dir).count()
      println(f"[idxprune] n=$n%8d fold: touched=${foldTouched.size}%5d/$totalBuckets%-5d " +
        f"sec=$foldSec%6.3f   delete: touched=${delTouched.size}%5d/$totalBuckets%-5d " +
        f"sec=$delSec%6.3f   rows_restored=${nBefore == nAfter}")
    }
    spark.stop()
  }
}
