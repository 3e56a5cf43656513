package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-loop ANN geometry sweep (VERDICT r8 #8): measure mean nDCG@10 of
  * the LSH lanes against the exact cosine truth across a (tables ×
  * planes) grid, without touching the registered q39/q164 constants —
  * the lanes take their plane sets as parameters, and the seeded-md5
  * recipe is prefix-stable, so every grid point reuses the registered
  * geometry's weights where they overlap.
  *
  * Also reports the mean candidate-set size per query (the probe-cost
  * side of the recall-for-space trade: T tables store T index entries
  * per vector and return ~T·|bucket| candidates).
  *
  * Usage: runMain graft.DevAnnSweep <sfDir>
  * Output: one markdown table on stdout (pasted into bench_evidence/).
  */
object DevAnnSweep {

  private val K = ops.SimilarityOps.TopK

  /** Driver-side nDCG@10 of a ranked lane vs the exact cosine ranking —
    * the same literal-LUT discounts q163 uses, on collected O(queries·K)
    * rows (metadata-scale: 50 rows per grid point).
    */
  private def meanNdcg(sys: DataFrame, truth: Map[(Long, Long), Long]): Double = {
    val disc: IndexedSeq[Double] =
      (1 to K).map(p => 1.0 / (math.log(p + 1.0) / math.log(2.0)))
    val idcg = (1 to K).map(i => (K + 1 - i) * disc(i - 1)).sum
    val rows = sys.select("qid", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    val qids = truth.keys.map(_._1).toSeq.distinct.sorted
    val nds = qids.map { q =>
      byQ.getOrElse(q, Array.empty).map { case (_, id, rn) =>
        truth.getOrElse((q, id), 0L) * disc(rn.toInt - 1)
      }.sum / idcg
    }
    nds.sum / math.max(nds.size, 1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.benchSession("graft-annsweep")
    spark.sparkContext.setLogLevel("WARN")
    import ops.SimilarityOps._

    val all = baseFor(spark, sfDir).persist()
    val n = all.count()
    val nq = math.min(n, ops.SimilarityOps.NQueries.toLong).toDouble
    val truth = simTopKOn(all).select("qid", "vec_id", "rn").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), K + 1L - r.getLong(2))).toMap
    // probe cost: scored/query counts every row that PAYS a full dot
    // product — for multi-table that is the PRE-dedup collision rows
    // (~T×|bucket| per the header's model; r9 ADVICE: the MAX-deduped
    // unique count understated this); cand/query is the post-dedup
    // unique candidate set the ranking sees
    def cost(cand: DataFrame): Double =
      cand.count() / nq

    println(s"### ANN geometry sweep — mean nDCG@10 vs exact cosine ($sfDir, n=$n)")
    println()
    println("| lane | tables T | planes k | mean nDCG@10 | scored/query | cand/query | % of corpus scored | note |")
    println("|---|---|---|---|---|---|---|---|")
    for (planes <- Seq(4, 5, 6, 8, 10)) {
      val ws = planeIntFor(planes)
      val nd = meanNdcg(simAnnLshOn(all, ws), truth)
      val c = cost(lshCandidates(all, ws))
      val note = if (planes == NPlanes) "**registered q39**" else ""
      println(f"| single | 1 | $planes | $nd%.3f | $c%.0f | $c%.0f | ${100 * c / n}%.1f%% | $note |")
    }
    for (tables <- Seq(2, 4, 6, 8); planes <- Seq(4, 5, 6)) {
      val tws = mtPlaneIntFor(tables, planes)
      val nd = meanNdcg(simAnnMultiLshOn(all, tws), truth)
      val scored = cost(mtCollisions(all, tws))
      val c = cost(mtCandidates(all, tws))
      val note = if (tables == MtTables && planes == MtPlanes) "**registered q164**" else ""
      println(f"| multi | $tables | $planes | $nd%.3f | $scored%.0f | $c%.0f | ${100 * scored / n}%.1f%% | $note |")
    }
    // IVF: the probe count is the cost knob (cells probed per query);
    // the cell count stays corpus-derived like the registered q50 lane
    val k = ivfKFor(n)
    for (nProbes <- Seq(1, 2, 4, 8)) {
      val nd = meanNdcg(simAnnIvfOn(all, k, nProbes), truth)
      val c = cost(ivfCandidates(all, k, nProbes))
      val note = if (nProbes == 2) "**registered q50**" else ""
      println(f"| ivf | - | p=$nProbes | $nd%.3f | $c%.0f | $c%.0f | ${100 * c / n}%.1f%% | $note |")
    }
    all.unpersist(false)
    spark.stop()
  }
}
