package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Convert the "toy-kb bucket floor" ATTRIBUTION of the composite
  * decades' fold/tombstone residual into a MEASUREMENT (r16 verdict
  * #5 / next-round #2). The r15/r16 story: q219's fold reads 1.70x
  * and q218's tombstone 1.42x at 10x documents while the q215
  * control sits at 1.22x, and the residual is attributed to
  * `bucketsFor`'s floor — at fixture scale the index has ~8-16
  * buckets, every mutation's key set covers all of them, and the
  * stage-and-swap rewrite is therefore corpus-proportional, whereas
  * the 5 M-doc DevIdxPrune table shows flat fold/delete at real
  * bucket counts. No capture actually ran the decade with the
  * amplified index at a kb scaled past the floor.
  *
  * This probe does exactly that: it builds the amplified corpus's
  * admission index TWICE — at the default `bucketsFor(count)` kb
  * (what the registered lanes get) and at a corpus-PROPORTIONAL kb
  * (base kb x amp, the bucket-per-docs ratio a deployment holds as
  * the corpus grows) — and times the identical fold / tombstone
  * mutations against each through a fresh generation-pinned overlay
  * per rep (the registered lanes' clone-free entry). Untimed
  * diagnostics name the floor term directly: the co-resident rows a
  * mutation reads back and rewrites because they share a touched
  * bucket, vs the mutation's own added/deleted rows.
  *
  * Usage: runMain graft.DevKbScale [amp]
  */
object DevKbScale {
  import graft.ops.PipelineOps

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private final case class Arm(label: String, d: String, kb: Int)

  def main(args: Array[String]): Unit = {
    val amp = args.headOption.map(_.toInt).getOrElse(10)
    val base = "/root/testdata/sf0.1"
    val spark = Sessions.benchSession("graft-kbscale")
    spark.sparkContext.setLogLevel("WARN")
    val ampDir = DevAmpScale.ensureAmpDir(spark, base, amp)
    val tmp = System.getProperty("java.io.tmpdir")

    // the two mutation inputs, per corpus, staged OUTSIDE every timed
    // region: fold input = epoch-1 admitted signatures (q219's fold
    // verbatim), tombstone input = the takedown set's signatures
    // (q218's delete verbatim)
    val foldSigs = scala.collection.mutable.Map[String, DataFrame]()
    val delSigs = scala.collection.mutable.Map[String, DataFrame]()
    Seq(base, ampDir).foreach { d =>
      val (_, _, admSigs0, handles) = PipelineOps.pipelineIncrementFull(spark, d)
      val g = admSigs0.localCheckpoint(true)
      handles.foreach(_.unpersist(false))
      foldSigs(d) = g
      val ds = PipelineOps.sharedBaseIndex(spark, d)
        .filter(PipelineOps.takedownPred(col("doc_id"))).localCheckpoint(true)
      delSigs(d) = ds
    }

    val baseN = PipelineOps.sharedBaseIndex(spark, base).count()
    val ampN = PipelineOps.sharedBaseIndex(spark, ampDir).count()
    val baseKb = PipelineOps.bucketsFor(baseN)
    val ampKbDefault = PipelineOps.bucketsFor(ampN)
    val ampKbProp = baseKb * amp
    println(f"[kbscale] base n=$baseN kb=$baseKb | amp$amp n=$ampN " +
      f"kbDefault=$ampKbDefault kbProp=$ampKbProp " +
      f"(foldRows base=${foldSigs(base).count()} amp=${foldSigs(ampDir).count()}; " +
      f"delRows base=${delSigs(base).count()} amp=${delSigs(ampDir).count()})")

    val arms = Seq(
      Arm("base/default", base, baseKb),
      Arm(s"amp$amp/default", ampDir, ampKbDefault),
      Arm(s"amp$amp/prop", ampDir, ampKbProp))

    def runArm(arm: Arm, warm: Boolean): (Double, Double) = {
      val sigs = PipelineOps.sharedBaseIndex(spark, arm.d)
      val dir = s"$tmp/graft_kbscale_" +
        java.lang.Integer.toHexString(arm.d.hashCode) + s"_${arm.kb}"
      if (!graft.io.LayoutFs.exists(s"$dir/_META"))
        PipelineOps.writeAdmissionIndex(sigs, dir, arm.kb)
      def freshOverlay(tag: String): PipelineOps.OverlayIndex = {
        val ov = s"${dir}_ov_$tag"
        graft.io.LayoutFs.deleteTree(ov)
        new PipelineOps.OverlayIndex(dir, ov)
      }
      def best2(f: PipelineOps.OverlayIndex => Unit): Double =
        (1 to 2).map { i =>
          val ov = freshOverlay(s"r$i")
          spark.catalog.clearCache(); System.gc()
          t(f(ov))._2
        }.min
      val tFold = best2(ov =>
        { PipelineOps.foldIntoAdmissionIndex(spark, ov, foldSigs(arm.d)); () })
      val tDel = best2(ov =>
        { PipelineOps.deleteFromAdmissionIndex(spark, ov, delSigs(arm.d)); () })
      if (!warm) {
        // untimed diagnostics: how much of the rewrite is co-resident
        // ballast (rows read back + rewritten only because they share
        // a touched bucket with the mutation)
        val addRows = PipelineOps.indexRowsOf(foldSigs(arm.d), arm.kb).count()
        val ovd = freshOverlay("diag")
        val touched = PipelineOps.foldIntoAdmissionIndex(spark, ovd, foldSigs(arm.d))
        val coRes = PipelineOps.DirIndex(dir).open(spark, touched).count()
        println(f"[kbscale] ${arm.label}%-14s kb=${arm.kb}%4d " +
          f"fold=$tFold%6.2f s del=$tDel%6.2f s " +
          f"touched=${touched.size}%4d/${arm.kb}%-4d " +
          f"addRows=$addRows%8d coResidentRows=$coRes%9d " +
          f"ballast=${coRes.toDouble / math.max(addRows, 1L)}%5.2fx")
      }
      (tFold, tDel)
    }

    // warm pass over every arm first (JIT/codegen otherwise lands in
    // whichever arm runs first and corrupts the decade ratios)
    arms.foreach(runArm(_, warm = true))
    val results = arms.map(a => a -> runArm(a, warm = false))
    val (bF, bD) = results.head._2
    results.drop(1).foreach { case (a, (f, dl)) =>
      println(f"[kbscale] decade ${a.label}%-14s fold-x=${f / bF}%5.2f " +
        f"del-x=${dl / bD}%5.2f  (data-x=$amp, control decade band ~1.2x)")
    }
    spark.stop()
  }
}
