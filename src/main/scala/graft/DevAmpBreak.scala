package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level decomposition of the composite lanes' amp-decade
  * factors (r14 verdict #1/#2: q216 read 2.62x and q218 1.69x at 10x
  * data while their siblings sat at 1.1-1.3x — the aggregate factor
  * cannot name WHICH stage carries the corpus-proportional term).
  * Replays each lane's dataflow synchronously with a timer around
  * every stage, at the base sf and at documents-x`amp`, and prints a
  * per-stage base/amp/time-x table. The replay is the same DataFrame
  * code the registered lanes run (same helpers, same probe), minus
  * the streaming machinery — the residual between the lane's
  * DevAmpScale time and the replay total IS the machinery.
  *
  * Usage: runMain graft.DevAmpBreak [amp] [q216|q218|both]
  */
object DevAmpBreak {
  import graft.ops.PipelineOps

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** q216's per-batch chain, replayed synchronously over the three
    * id-ordered arrival slices with a timer per sub-stage. Stage keys
    * are cumulative across the three batches.
    */
  private def breakQ216(s: SparkSession, d: String): Seq[(String, Double)] = {
    val acc = scala.collection.mutable.LinkedHashMap[String, Double]()
      .withDefaultValue(0.0)
    val (_, tFix) = t {
      // the two static artifacts the lane stages before the stream
      PipelineOps.persistAdmissionIndex(s, d)
    }
    acc("static_index") += tFix
    val d0 = graft.ops.CoreOps.jsonlDocs(s, d)
      .select(col("doc_id"), col("meta.source").as("source"), col("text"))
    val (bench, tBench) = t {
      val b = d0.filter(col("doc_id") < PipelineOps.BenchHoldout)
        .select(graft.functions.HashFns.tokens(col("text")).as("btoks"))
        .filter(size(col("btoks")) >= PipelineOps.DecontamGram)
        .select(explode(graft.functions.HashFns.hashedShingles(
          graft.functions.HashFns.shingles(
            col("btoks"), PipelineOps.DecontamGram))).as("g"))
        .distinct().localCheckpoint(true)
      b
    }
    acc("bench_grams") += tBench
    val (slices, tSlices) = t {
      val ranked = PipelineOps.deltaBatch(d0)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
        .localCheckpoint(true)
      val n = ranked.count()
      (0 until 3).map(i =>
        ranked.filter(col("rk") > lit(i * n / 3) && col("rk") <= lit((i + 1) * n / 3))
          .select("doc_id", "source", "text").localCheckpoint(true))
    }
    acc("slice_staging") += tSlices
    val idxDir = PipelineOps.admissionIndexDir(d)
    var prior: DataFrame = null
    slices.zipWithIndex.foreach { case (batch, _) =>
      val (audit, t1) = t {
        val a = PipelineOps.gateAudit(batch)
          .withColumn("n_tok",
            size(graft.functions.HashFns.tokens(col("rtext"))).cast("long"))
          .localCheckpoint(true)
        a.count(); a
      }
      acc("gate_audit") += t1
      // replicate spiBatchAdmit's sub-stages with timers
      val (dg3k, t2) = t {
        val g = audit.filter(col("score") >= PipelineOps.QualityMin &&
            col("lang_pred") =!= "und" &&
            col("n_red") < PipelineOps.PiiQuarantineAt)
          .select("doc_id", "source", "text", "rtext", "n_tok")
          .localCheckpoint(true)
        g.count(); g
      }
      acc("gate_filter") += t2
      val (contam, t3) = t {
        val c = dg3k
          .select(col("doc_id"),
            graft.functions.HashFns.tokens(col("text")).as("ctoks"))
          .filter(size(col("ctoks")) >= PipelineOps.DecontamGram)
          .select(col("doc_id"), explode(graft.functions.HashFns.hashedShingles(
            graft.functions.HashFns.shingles(
              col("ctoks"), PipelineOps.DecontamGram))).as("g"))
          .join(broadcast(bench), "g")
          .select("doc_id").distinct()
          .localCheckpoint(true)
        c.count(); c
      }
      acc("contam") += t3
      val (dSigs, t4) = t {
        val dcln = dg3k.join(
            contam.withColumn("x", lit(true)), Seq("doc_id"), "left")
          .filter(col("x").isNull).drop("x")
        val ds = PipelineOps.sigsOf(dcln).localCheckpoint(true)
        ds.count(); ds
      }
      acc("sigs") += t4
      val (_, t5) = t {
        force(PipelineOps.probeAdmissionIndex(s, idxDir, dSigs))
      }
      acc("dvb_disk_probe") += t5
      val (_, t6) = t {
        val dBand = PipelineOps.bandedOf(dSigs)
        val pr = if (prior == null) dSigs.limit(0) else prior
        val earlier = PipelineOps.bandedOf(pr).unionByName(dBand)
        val m = aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), _ + _)
        force(dBand.as("x").join(earlier.as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.doc_id") > col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
          .join(dSigs.select(col("doc_id").as("a"), col("sig").as("sig_a")), "a")
          .join(pr.unionByName(dSigs)
            .select(col("doc_id").as("b"), col("sig").as("sig_b")), "b")
          .filter(m.cast("double") / lit(graft.functions.HashFns.MinhashK.toDouble) >= 0.5)
          .select(col("a").as("doc_id")).distinct())
      }
      acc("dwd_join") += t6
      prior = if (prior == null) dSigs
              else prior.unionByName(dSigs).localCheckpoint(true)
    }
    acc.toSeq
  }

  /** q218's chain with a timer per stage. */
  private def breakQ218(s: SparkSession, d: String): Seq[(String, Double)] = {
    val acc = scala.collection.mutable.LinkedHashMap[String, Double]()
    val (_, t0) = t { PipelineOps.persistAdmissionIndex(s, d) }
    acc("static_index") = t0
    // overlay entry, matching the r17 lane (clone-free; stage name
    // kept so decade comparisons line up across rounds)
    val (idx, t1) = t { PipelineOps.overlayEntry(s, d, "tdbrk") }
    acc("index_clone") = t1
    val (_, t2) = t {
      PipelineOps.deleteFromAdmissionIndex(s, idx,
        PipelineOps.sharedBaseIndex(s, d)
          .filter(PipelineOps.takedownPred(col("doc_id"))))
    }
    acc("tombstone_delete") = t2
    val (_, t3) = t {
      val (card, handles) = PipelineOps.pipelineIncrementLazy(s, d,
        Some(ds => PipelineOps.probeAdmissionIndex(s, idx, ds)),
        PipelineOps.takedownResubs)
      force(card)
      handles.foreach(_.unpersist(false))
    }
    acc("resub_admission") = t3
    val (_, t4) = t { force(Registry.all.find(_.name == "q218_pipeline_takedown")
      .get.build(s, d)) }
    acc("full_lane_total") = t4
    acc.toSeq
  }

  /** q219's dataflow with a timer per stage (r15 verdict #4's
    * conditional ask: if q219's multi-capture decade median lands
    * above its q215 control, name the stage carrying the residual).
    */
  private def breakQ219(s: SparkSession, d: String): Seq[(String, Double)] = {
    val acc = scala.collection.mutable.LinkedHashMap[String, Double]()
    val ((admRows, admSigs), t1) = t {
      val (_, admRows0, admSigs0, handles1) = PipelineOps.pipelineIncrementFull(s, d)
      val r = admRows0.localCheckpoint(true)
      val g = admSigs0.localCheckpoint(true)
      handles1.foreach(_.unpersist(false))
      (r, g)
    }
    acc("epoch1_admission") = t1
    val (_, t0) = t { PipelineOps.persistAdmissionIndex(s, d) }
    acc("static_index") = t0
    // overlay entry, matching the r17 lane (clone-free; stage name
    // kept so decade comparisons line up across rounds)
    val (idx, t2) = t { PipelineOps.overlayEntry(s, d, "e2brk") }
    acc("index_clone") = t2
    val (_, t3) = t { PipelineOps.foldIntoAdmissionIndex(s, idx, admSigs) }
    acc("fold") = t3
    val (_, t4) = t {
      val (card2, handles2) = PipelineOps.pipelineIncrementLazy(s, d,
        Some(ds => PipelineOps.probeAdmissionIndex(s, idx, ds)),
        d0 => PipelineOps.epoch2Batch(d0, admRows))
      force(card2)
      handles2.foreach(_.unpersist(false))
    }
    acc("epoch2_admission") = t4
    val (_, t5) = t { force(Registry.all.find(_.name == "q219_pipeline_two_epoch")
      .get.build(s, d)) }
    acc("full_lane_total") = t5
    acc.toSeq
  }

  def main(args: Array[String]): Unit = {
    val amp = args.headOption.map(_.toInt).getOrElse(10)
    val mode = if (args.length > 1) args(1) else "both"
    val base = "/root/testdata/sf0.1"
    val spark = Sessions.benchSession("graft-ampbreak")
    spark.sparkContext.setLogLevel("WARN")
    val ampDir = DevAmpScale.ensureAmpDir(spark, base, amp)
    def run(name: String, f: (SparkSession, String) => Seq[(String, Double)]): Unit = {
      println(s"== $name stage breakdown (base=$base vs amp$amp) ==")
      // warm pass per arm first: the stage codegen/JIT otherwise lands
      // entirely in whichever arm runs first and corrupts every ratio
      f(spark, base); spark.catalog.clearCache()
      f(spark, ampDir); spark.catalog.clearCache()
      val bSeq = f(spark, base)
      spark.catalog.clearCache()
      val a = f(spark, ampDir).toMap
      bSeq.foreach { case (k, bv) =>
        val av = a.getOrElse(k, -1.0)
        println(f"[ampbreak] $name $k%-18s base=$bv%7.2f s  amp$amp=$av%7.2f s  time-x=${av / math.max(bv, 1e-9)}%5.2f")
      }
      val bt = bSeq.map(_._2).sum
      val at = bSeq.map { case (k, _) => a.getOrElse(k, 0.0) }.sum
      println(f"[ampbreak] $name TOTAL              base=$bt%7.2f s  amp$amp=$at%7.2f s  time-x=${at / math.max(bt, 1e-9)}%5.2f")
    }
    if (mode == "q216" || mode == "both") run("q216", breakQ216)
    if (mode == "q218" || mode == "both") run("q218", breakQ218)
    if (mode == "q219") run("q219", breakQ219)
    spark.stop()
  }
}
