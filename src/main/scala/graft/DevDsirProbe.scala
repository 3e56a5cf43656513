package graft

import org.apache.spark.sql.functions._

/** Dev-loop decomposition of q154 (stream DSIR gate), VERDICT r8 #4:
  * the lane was the heaviest idle query (4.52 s) — split its cost into
  * (a) static prep (corpus-gram histogram — the part the r9 single-pass
  * conditional aggregate halves), (b) fixture staging (first run only;
  * marker-cached after), and (c) the streaming lifecycle
  * (start/processAllAvailable/stop), read as full-lane minus prep.
  *
  * Usage: runMain graft.DevDsirProbe <sfDir> — prints one line per rep.
  */
object DevDsirProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.benchSession("graft-dsirprobe")
    spark.sparkContext.setLogLevel("WARN")
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val q = Registry.all.find(_.name == "q154_stream_dsir_gate").get
    (1 to 3).foreach { rep =>
      spark.catalog.clearCache(); System.gc()
      val tPrep = t {
        graft.ops.TextOps.dsirGrams(spark, sfDir)
          .filter(col("doc_id") % 5 =!= 4)
          .groupBy("bkt")
          .agg(count(lit(1)).as("rawc"),
               count(when(col("lang") === "en", 1)).as("tgtc"))
          .collect()
      }
      // the pre-r9 shape for comparison: the unpersisted gram relation
      // aggregated twice (raw + filtered target) then left-joined
      val tOld = t {
        val g = graft.ops.TextOps.dsirGrams(spark, sfDir)
          .filter(col("doc_id") % 5 =!= 4)
        val raw = g.groupBy("bkt").agg(count(lit(1)).as("rawc"))
        val tgt = g.filter(col("lang") === "en")
          .groupBy("bkt").agg(count(lit(1)).as("tgtc"))
        raw.join(tgt, Seq("bkt"), "left").na.fill(0L, Seq("tgtc"))
          .select("bkt", "rawc", "tgtc").collect()
      }
      val tFull = t {
        q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      println(f"[dsirprobe] rep$rep static_prep=$tPrep%.2f (r8 two-scan " +
        f"shape=$tOld%.2f) full_lane=$tFull%.2f " +
        f"stream_lifecycle~=${tFull - tPrep}%.2f (rep1 full includes staging " +
        "unless the fixture marker is already current)")
    }
    spark.stop()
  }
}
