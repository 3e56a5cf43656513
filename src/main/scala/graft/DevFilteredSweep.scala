package graft

/** Dev harness (not part of the registered surface): the measured
  * recall-vs-probe-budget grid behind q174's boost factor
  * (bench_evidence/r10_filtered_sweep.md — the DevAnnSweep precedent
  * for q164's geometry). Sweeps the probe count per label granularity
  * so the registered FilterBoost is CHOSEN from data, not guessed:
  * coarser labels keep more candidates after the filter (less boost
  * needed), finer labels discard more (more boost needed).
  *
  * Run: `sbt "runMain graft.DevFilteredSweep [sfDir]"`.
  */
object DevFilteredSweep {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.benchSession("graft-filteredsweep")
    spark.sparkContext.setLogLevel("WARN")

    val probes = Seq(2, 4, 8, 16, 32)
    val variants = Seq(
      ("coarse lbl%2", col("label").cast("long") % 2),
      ("registered lbl", col("label").cast("long")),
      ("fine lbl*3+id%3", col("label").cast("long") * 3 + col("vec_id") % 3))
    val rows = ops.SimilarityOps.filteredSweepRows(spark, sfDir, probes, variants)

    println(s"### Filtered-ANN probe sweep — recall vs probe budget per label granularity and serving mode ($sfDir)")
    println()
    println("recall is TRUTH-ADJUSTED (overlap / min(TopK, per-query filtered-truth size));")
    println("mode `post` scores the whole probed membership then filters (q174),")
    println("mode `part` reads only the (label, cell) lists so cand == kept (q183).")
    println()
    println("| label set | #labels | mode | probes | boost vs q50 | cand/query | kept/query | recall@10 | truthless |")
    println("|---|---|---|---|---|---|---|---|---|")
    rows.foreach { case (v, nl, m, p, c, kp, r, ntl) =>
      val boost = p.toDouble / ops.SimilarityOps.IvfProbes
      val reg = p == ops.SimilarityOps.IvfProbes * ops.SimilarityOps.FilterBoost
      val mark =
        if (v.startsWith("registered") && reg && m == "post") " **registered q174 boost**"
        else if (v.startsWith("registered") && reg && m == "part") " **registered q183**"
        else ""
      println(f"| $v | $nl | $m | $p | ${boost}%.0fx | $c%.0f | $kp%.1f | $r%.2f | $ntl |$mark")
    }
    spark.stop()
  }
}
