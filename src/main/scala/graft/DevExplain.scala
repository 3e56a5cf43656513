package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for named lanes to plans/<tag>/<name>_<suffix>.txt
  * — the r17 optimization round's before/after plan evidence. Lanes whose
  * registered entry eagerly checkpoints (plan prints as an RDD scan) are
  * dumped via their lazy pre-materialization variants, the graft.Plans
  * precedent.
  *
  * Usage: runMain graft.DevExplain <sfDir> <tag> <suffix> <name> [...]
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = Sessions.benchSession("graft-devexplain")
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)

    def dump(name: String, dfAndRelease: => (DataFrame, () => Unit)): Unit = {
      try {
        val (df, release) = dfAndRelease
        val txt =
          try df.queryExecution.explainString(FormattedMode)
          finally release()
        java.nio.file.Files.writeString(
          outDir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"[devexplain] wrote ${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[devexplain] $name failed: $e")
      }
    }

    val byName = Registry.all.map(q => q.name -> q).toMap
    names.foreach {
      case n @ "q34_dedup_minhash" =>
        dump(n, {
          val (df, h) = ops.DedupOps.dedupMinhashLazy(spark, sfDir)
          (df, () => { h.unpersist(false); () })
        })
      case n @ "q137_dedup_incremental" =>
        dump(n, {
          val (df, h) = ops.DedupOps.dedupIncrementalLazy(spark, sfDir)
          (df, () => { h.unpersist(false); () })
        })
      case n @ "q215_pipeline_increment" =>
        dump(n, {
          val (df, hs) = ops.PipelineOps.pipelineIncrementLazy(spark, sfDir)
          (df, () => hs.foreach(_.unpersist(false)))
        })
      case n @ "q217_probe" =>
        // the pruned disk probe relation itself (q217's distinguishing
        // plan surface; the card above it is q215's verbatim)
        dump(n, {
          val dir = ops.PipelineOps.persistAdmissionIndex(spark, sfDir)
          val probeSigs = ops.PipelineOps.sharedBaseIndex(spark, sfDir).limit(5)
          (ops.PipelineOps.probeAdmissionIndex(spark, dir, probeSigs),
            () => ())
        })
      case n @ "q213_pairs" =>
        // the pair stage over the staged grain relation (the registered
        // lane checkpoints; cp = identity keeps the plan inspectable)
        dump(n, {
          val grains = ops.MultimodalOps.audioGrainsFor(spark, sfDir)
          (ops.MultimodalOps.audioClipDupFrom(grains, identity), () => ())
        })
      case n @ "q152_dsir_weight" =>
        dump(n, {
          val (df, hs) = ops.TextOps.dsirWeightLazy(spark, sfDir)
          (df, () => hs.foreach(_.unpersist(false)))
        })
      case n =>
        byName.get(n) match {
          case Some(q) => dump(n, (q.build(spark, sfDir), () => ()))
          case None => System.err.println(s"[devexplain] unknown lane $n")
        }
    }
    spark.stop()
  }
}
