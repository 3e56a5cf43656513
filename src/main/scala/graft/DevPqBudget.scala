package graft

/** Dev harness for the PQ-training-budget question (r11 verdict #2):
  * does scaling the Lloyd round count with corpus size close the sf0.1
  * inversion where trained residual books LOSE to seed books
  * (bench_evidence/r11_grid_sf.md reading #3)? Prints, per rounds
  * value, trained vs seed mean nDCG@10 (integer millionths, exact-L2
  * truth, the q163 metric) plus the training wall time.
  *
  * Usage: runMain graft.DevPqBudget <sfDir> <rounds,rounds,...> [nQueries]
  */
object DevPqBudget {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val roundsList = args(1).split(",").map(_.trim.toInt).toSeq
    val nq = if (args.length > 2) args(2).toInt else 100
    val spark = Sessions.benchSession("graft-pqbudget")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val rows = ops.SimilarityOps.pqBudgetProbe(spark, sfDir, roundsList, nq)
    rows.foreach { case (r, seed, trained) =>
      println(f"[pqbudget] rounds=$r%-3d seed_ndcg_e6=$seed%7d " +
        f"trained_ndcg_e6=$trained%7d delta=${trained - seed}%+7d")
    }
    ops.SimilarityOps.pqBudgetCodeSurvival(spark, sfDir, roundsList)
      .foreach { case (r, total, err) =>
        println(f"[pqbudget] rounds=$r%-3d surviving_codes=$total%3d/128 " +
          f"final_round_err_e6=$err%12d")
      }
    println(f"[pqbudget] total ${(System.nanoTime() - t0) / 1e9}%.1f s at $sfDir")
    spark.stop()
  }
}
