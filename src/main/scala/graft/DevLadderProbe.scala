package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

/** Settle the q216 join-width ladder on evidence (r16 verdict #4 /
  * next-round #4). The ladder raises `spark.sql.shuffle.partitions`
  * per micro-batch (1 partition per ~1k rows, floor 2, cap at
  * cluster width) before the batch chain plans; the r16 A/B showed
  * it moves NOTHING at the registered lane's 3-30k-row batches — the
  * guard is claimed to matter only for a deployment-size batch
  * joining at the stream wrapper's fixed width of 2. That batch can
  * be STAGED without the stream: this probe amplifies the corpus,
  * takes the lane's whole delta as ONE trigger-sized batch (prior
  * arrivals = the sigs of an equally-sized earlier batch, exactly
  * the lane's accumulated state), and times the identical per-batch
  * chain — gate audit, contamination, signatures, disk probe,
  * dup-within join, verdict + state writes — at width 2 (no ladder)
  * vs the ladder's scaled width. If the ladder arm wins at this
  * batch size, the code earns its keep with a number; if it does
  * not, the ladder should be deleted.
  *
  * Usage: runMain graft.DevLadderProbe [amp]
  */
object DevLadderProbe {
  import graft.ops.{CoreOps, PipelineOps}
  import graft.functions.HashFns.{tokens, hashedShingles, shingles}

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val amp = args.headOption.map(_.toInt).getOrElse(100)
    val base = "/root/testdata/sf0.1"
    val spark = Sessions.benchSession("graft-ladderprobe")
    spark.sparkContext.setLogLevel("WARN")
    val d = DevAmpScale.ensureAmpDir(spark, base, amp)
    val tmp = System.getProperty("java.io.tmpdir")
    val outDir = s"$tmp/graft_ladderprobe_out"

    // the lane's static artifacts, staged as q216 stages them
    val idxDir = PipelineOps.persistAdmissionIndex(spark, d)
    val d0 = CoreOps.jsonlDocs(spark, d)
      .select(col("doc_id"), col("meta.source").as("source"), col("text"))
    val benchGrams: Array[Long] = d0
      .filter(col("doc_id") < PipelineOps.BenchHoldout)
      .select(tokens(col("text")).as("btoks"))
      .filter(size(col("btoks")) >= PipelineOps.DecontamGram)
      .select(explode(hashedShingles(
        shingles(col("btoks"), PipelineOps.DecontamGram))).as("g"))
      .distinct().collect().map(_.getLong(0)).sorted

    // two id-ordered halves of the delta: half A's clean signatures
    // become half B's prior-arrival state; ONLY half B's chain is
    // timed (the deployment shape: a large trigger with an equally
    // large accumulated day)
    val ranked = PipelineOps.deltaBatch(d0)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
      .localCheckpoint(true)
    val n = ranked.count()
    val halfA = ranked.filter(col("rk") <= lit(n / 2))
      .select("doc_id", "source", "text").localCheckpoint(true)
    val halfB = ranked.filter(col("rk") > lit(n / 2))
      .select("doc_id", "source", "text").localCheckpoint(true)
    val nB = halfB.count()

    val emptyPrior = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("sig", ArrayType(LongType)))))
    val width = spark.sparkContext.defaultParallelism

    def runBatch(batch: DataFrame, prior: DataFrame, np: Int,
        tag: String): DataFrame = {
      spark.conf.set("spark.sql.shuffle.partitions", np)
      val wide = batch.repartition(width)
      val audit = PipelineOps.gateAudit(wide)
        .withColumn("n_tok", size(tokens(col("rtext"))).cast("long"))
        .persist()
      try {
        val (verdicts, dSigs, dg3k) = graft.streaming.StreamingOps
          .spiBatchAdmit(spark, audit, benchGrams, prior,
            ds => PipelineOps.probeAdmissionIndex(spark, idxDir, ds))
        verdicts.write.mode("overwrite").parquet(s"$outDir/$tag/verdicts")
        dSigs.write.mode("overwrite").parquet(s"$outDir/$tag/sigs")
        dg3k.unpersist(false)
        spark.read.parquet(s"$outDir/$tag/sigs")
      } finally { audit.unpersist(false); () }
    }

    // prior state = half A's signatures, built once at default width
    spark.conf.set("spark.sql.shuffle.partitions", width)
    val prior = runBatch(halfA, emptyPrior, width, "priorstage")
      .localCheckpoint(true)
    val nPrior = prior.count()

    val npLadder = math.max(2, math.min(width, (nB / 1000L + 1L).toInt))
    println(f"[ladderprobe] amp=$amp deltaRows=$n batchB=$nB " +
      f"priorSigs=$nPrior width=$width npLadder=$npLadder")

    def arm(np: Int, tag: String): Double =
      (1 to 2).map { i =>
        spark.catalog.clearCache(); System.gc()
        t(runBatch(halfB, prior, np, s"$tag$i").count())._2
      }.min

    // warm both widths once (codegen/JIT), then interleave the timed
    // reps so neither arm owns the warm cache
    arm(2, "warm2"); arm(npLadder, "warmL")
    val t2 = arm(2, "fixed2")
    val tL = arm(npLadder, "ladder")
    val t2b = arm(2, "fixed2b")
    val tLb = arm(npLadder, "ladderb")
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    val bestFixed = math.min(t2, t2b)
    val bestLadder = math.min(tL, tLb)
    println(f"[ladderprobe] batch=$nB rows: width2=$bestFixed%6.2f s " +
      f"(reps $t2%.2f/$t2b%.2f)  ladder(np=$npLadder)=$bestLadder%6.2f s " +
      f"(reps $tL%.2f/$tLb%.2f)  speedup=${bestFixed / bestLadder}%5.2fx")
    spark.stop()
  }
}
