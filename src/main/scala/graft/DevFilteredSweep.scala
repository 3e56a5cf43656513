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

    println(s"### Filtered-ANN probe sweep — recall vs probe budget per label granularity ($sfDir)")
    println()
    println("| label set | #labels | probes | boost vs q50 | cand/query | kept/query | recall@10 |")
    println("|---|---|---|---|---|---|---|")
    rows.foreach { case (v, nl, p, c, kp, r) =>
      val boost = p.toDouble / ops.SimilarityOps.IvfProbes
      val mark = if (v.startsWith("registered") &&
        p == ops.SimilarityOps.IvfProbes * ops.SimilarityOps.FilterBoost) " **registered boost**" else ""
      println(f"| $v | $nl | $p | ${boost}%.0fx | $c%.0f | $kp%.1f | $r%.2f |$mark")
    }
    spark.stop()
  }
}
