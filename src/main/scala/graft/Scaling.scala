package graft

import org.apache.spark.sql.functions.col

/** Scaling sweep: times representative queries at sf0.001 / 0.01 / 0.1
  * (100x data spread) and writes SCALING.md — the measured answer to
  * "does this plan survive a scale-up?". A query whose time grows far
  * slower than data size is overhead-bound (fine); one growing faster
  * than linear has a super-linear stage (a problem the plan shape
  * should have prevented). Run: `sbt "runMain graft.Scaling"`.
  */
object Scaling {
  private val Sfs = Seq("0.001", "0.01", "0.1")

  private val Picks = Seq(
    "q01_scan_agg" -> "scan + aggregate",
    "q05_filter_gt" -> "pushed filter",
    "q14_topk" -> "global top-k (TakeOrdered)",
    "q22_tpch_q1" -> "wide decimal aggregate",
    "q23_tpch_q3" -> "3-table join + top-10",
    "q69_tpch_q5" -> "6-table star join",
    "q100_tpch_q8" -> "7-table star, ratio agg",
    "q24_window_rank" -> "partitioned window",
    "q48_topk_per_key" -> "custom TopKPerKey operator",
    "q33_dedup_exact" -> "hash-groupBy dedup",
    "q34_dedup_minhash" -> "MinHash LSH near-dup",
    "q38_sim_topk" -> "brute-force cosine top-k",
    "q50_sim_ann_ivf" -> "IVF ANN",
    "q111_global_shuffle" -> "sharded training shuffle",
    "q112_bpe_pairs" -> "BPE pair counts",
    "q117_boilerplate" -> "corpus segment dedup",
    "q118_triangles" -> "triangle counting",
    "q113_upsert" -> "CDC upsert",
    "q66_range_join" -> "binned range join")

  def main(args: Array[String]): Unit = {
    val spark = Sessions.benchSession("graft-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    val byName = Registry.all.map(q => q.name -> q).toMap
    // lineitem row counts give the actual data ratio per sf
    val rows = Sfs.map { sf =>
      sf -> spark.read.parquet(s"/root/testdata/sf$sf/lineitem.parquet").count()
    }.toMap

    def timeOne(name: String, sf: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        byName(name).build(spark, s"/root/testdata/sf$sf")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      reps.min
    }

    // warm-up pass (codegen + classloading)
    Picks.foreach { case (n, _) => timeOne(n, "0.001") }

    val sb = new StringBuilder
    sb.append("# SCALING — measured sf sweep (100x data spread)\n\n")
    sb.append("Best-of-2 seconds per scale factor (lineitem rows: ")
    sb.append(Sfs.map(sf => s"sf$sf=${rows(sf)}").mkString(", "))
    sb.append("), after a warm-up pass. `x0.1/x0.01` is the time ratio across\n")
    sb.append("a 10x data step — linear scaling would be 10, overhead-bound\n")
    sb.append("queries sit near 1; values well above 10 would flag a\n")
    sb.append("super-linear stage. Regenerate: `sbt \"runMain graft.Scaling\"`.\n\n")
    sb.append("| query | what | sf0.001 | sf0.01 | sf0.1 | x0.1/x0.01 |\n")
    sb.append("|---|---|---|---|---|---|\n")
    Picks.foreach { case (name, what) =>
      val t = Sfs.map(sf => sf -> timeOne(name, sf)).toMap
      val ratio = t("0.1") / math.max(t("0.01"), 1e-9)
      sb.append(f"| $name | $what | ${t("0.001")}%.2f | ${t("0.01")}%.2f " +
        f"| ${t("0.1")}%.2f | ${ratio}%.1f |\n")
      println(f"[scaling] $name%-22s ${t("0.001")}%6.2f ${t("0.01")}%6.2f " +
        f"${t("0.1")}%6.2f  ratio ${ratio}%.1f")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALING.md"), sb.toString)
    println(s"wrote SCALING.md (${Picks.size} queries x ${Sfs.size} sfs)")
    spark.stop()
  }
}
