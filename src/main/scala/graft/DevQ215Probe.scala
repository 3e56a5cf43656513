package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17: stage decomposition of the q215 admission chain — times each
  * materialization boundary of pipelineIncrementFull's dataflow
  * (replayed with the same helpers) so the optimization round can name
  * where the lane's seconds go instead of guessing.
  *
  * Usage: runMain graft.DevQ215Probe [sfDir] [reps]
  */
object DevQ215Probe {
  import graft.ops.{CoreOps, PipelineOps, TextOps}
  import graft.functions.HashFns._

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.benchSession("graft-q215probe")
    spark.sparkContext.setLogLevel("WARN")
    // untimed: session-shared artifacts (the bench prebuild contract)
    PipelineOps.sharedAudited(spark, d).count()
    PipelineOps.sharedBaseIndex(spark, d).count()
    (1 to reps).foreach { rep =>
      spark.catalog.clearCache()
      System.gc()
      val acc = scala.collection.mutable.LinkedHashMap[String, Double]()
      def stage[A](name: String)(f: => A): A = {
        val (a, sec) = t(f); acc(name) = sec; a
      }
      val d0 = stage("d0_jsonl_persist") {
        val x = CoreOps.jsonlDocs(spark, d)
          .select(col("doc_id"), col("meta.source").as("source"), col("text"))
          .repartition(col("doc_id"))
          .persist()
        x.count(); x
      }
      val bSigs = PipelineOps.sharedBaseIndex(spark, d)
      val dAudit = stage("gate_audit_persist") {
        val x = PipelineOps.gateAudit(PipelineOps.deltaBatch(d0)).persist()
        x.count(); x
      }
      val dg3k = stage("dg3k_persist") {
        val x = dAudit
          .filter(col("score") >= PipelineOps.QualityMin &&
            col("lang_pred") =!= "und" &&
            col("n_red") < PipelineOps.PiiQuarantineAt)
          .select("doc_id", "source", "text", "rtext")
          .persist()
        x.count(); x
      }
      val bench = stage("bench_grams") {
        d0.filter(col("doc_id") < PipelineOps.BenchHoldout)
          .select(tokens(col("text")).as("btoks"))
          .filter(size(col("btoks")) >= PipelineOps.DecontamGram)
          .select(explode(hashedShingles(
            shingles(col("btoks"), PipelineOps.DecontamGram))).as("g"))
          .distinct().localCheckpoint(true)
      }
      val clean = stage("contam_join_persist") {
        val dContam = dg3k.select(col("doc_id"), tokens(col("text")).as("ctoks"))
          .filter(size(col("ctoks")) >= PipelineOps.DecontamGram)
          .select(col("doc_id"),
            explode(hashedShingles(shingles(col("ctoks"),
              PipelineOps.DecontamGram))).as("g"))
          .join(broadcast(bench), "g")
          .select("doc_id").distinct()
        val x = dg3k
          .join(dContam.withColumn("is_contam", lit(true)), Seq("doc_id"), "left")
          .withColumn("is_contam", coalesce(col("is_contam"), lit(false)))
          .persist()
        x.count(); x
      }
      val dSigs = stage("delta_sigs_checkpoint") {
        PipelineOps.sigsOf(clean.filter(!col("is_contam")))
          .localCheckpoint(true)
      }
      val dBandS = PipelineOps.bandedWithSig(dSigs)
      val matches = aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), _ + _)
      def estOk = matches.cast("double") / lit(MinhashK.toDouble) >= 0.5
      val dvb = stage("dvb_count") {
        val x = dBandS.as("x")
          .join(capBandedFor(PipelineOps.bandedWithSig(bSigs), dBandS).as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key"))
          .select(col("x.doc_id").as("a"), col("x.sig").as("sig_a"),
                  col("y.doc_id").as("b"), col("y.sig").as("sig_b"))
          .dropDuplicates("a", "b")
          .filter(estOk)
          .select(col("a").as("doc_id")).distinct()
          .localCheckpoint(true)
        x.count(); x
      }
      val dwd = stage("dwd_count") {
        val x = dBandS.as("x").join(capBanded(dBandS).as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.doc_id") > col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("x.sig").as("sig_a"),
                  col("y.doc_id").as("b"), col("y.sig").as("sig_b"))
          .dropDuplicates("a", "b")
          .filter(estOk)
          .select(col("a").as("doc_id")).distinct()
          .localCheckpoint(true)
        x.count(); x
      }
      val flagged = stage("flagged_persist") {
        val x = clean
          .join(dvb.withColumn("f_dvb", lit(true)), Seq("doc_id"), "left")
          .join(dwd.withColumn("f_dwd", lit(true)), Seq("doc_id"), "left")
          .withColumn("is_dvb",
            !col("is_contam") && coalesce(col("f_dvb"), lit(false)))
          .withColumn("is_dwd",
            !col("is_contam") && !col("is_dvb") &&
              coalesce(col("f_dwd"), lit(false)))
          .persist()
        x.count(); x
      }
      stage("card_single_agg") {
        val gateOk = col("score") >= PipelineOps.QualityMin &&
          col("lang_pred") =!= "und" &&
          col("n_red") < PipelineOps.PiiQuarantineAt
        val admitted = gateOk && !coalesce(col("is_contam"), lit(false)) &&
          !coalesce(col("is_dvb"), lit(false)) &&
          !coalesce(col("is_dwd"), lit(false))
        dAudit
          .join(flagged.select("doc_id", "is_contam", "is_dvb", "is_dwd"),
            Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_delta"),
            sum(when(col("score") < PipelineOps.QualityMin, 1L).otherwise(0L))
              .as("n1"),
            sum(when(coalesce(col("is_contam"), lit(false)), 1L).otherwise(0L))
              .as("n4"),
            sum(when(admitted, 1L).otherwise(0L)).as("n_admitted"),
            sum(when(admitted, col("doc_id")).otherwise(0L)).as("checksum"),
            sum(when(admitted, size(tokens(col("rtext"))).cast("long"))
              .otherwise(0L)).as("admitted_tok"))
          .orderBy("source")
          .collect()
      }
      Seq(dAudit, dg3k, clean, flagged, d0).foreach(_.unpersist(false))
      val total = acc.values.sum
      println(f"[q215probe] rep $rep total=$total%.2f s")
      acc.foreach { case (k, v) => println(f"[q215probe]   $k%-24s $v%6.2f") }
    }
    spark.stop()
  }
}
