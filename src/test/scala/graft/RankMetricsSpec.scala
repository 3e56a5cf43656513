package graft

import org.scalatest.funsuite.AnyFunSuite

/** q163 rank-metric properties:
  *  1. the integer metrics are recomputed exactly from the ranked lists
  *     the other registry lanes emit (q39 LSH, q38 exact cosine, the PQ
  *     pair) using the same literal discount LUT;
  *  2. the integer nDCG tracks textbook float nDCG within the LUT
  *     quantization (< 1e-4);
  *  3. sanity floors: ADC (whose candidate set is the whole corpus)
  *     scores well above zero; all metrics live in [0, 1e6].
  */
class RankMetricsSpec extends AnyFunSuite with SparkTestBase {

  private val K = 10
  private val disc: IndexedSeq[Long] =
    (1 to K).map(p => math.floor(1e9 / (math.log(p + 1.0) / math.log(2.0))).toLong)
  private val idcgE9: Long = (1 to K).map(i => (K + 1 - i) * disc(i - 1)).sum

  test("q163 metrics match a recomputation from the ranked lanes") {
    val got = ops.SimilarityOps.rankMetrics(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
                 // (n_rel, first_rel_pos, dcg_e9, mrr_e6, ndcg_e6)
                 (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

    // ranked lists from the sibling registry lanes
    def ranked(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Long)]] =
      df.select("qid", "vec_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (q, vs) =>
          (q, vs.sortBy(_._3).map(t => (t._2, t._3)).toSeq)
        }
    val lsh = ranked(ops.SimilarityOps.simAnnLsh(spark, sf))
    val mlsh = ranked(ops.SimilarityOps.simAnnMultiLsh(spark, sf))
    val ivf = ranked(ops.SimilarityOps.simAnnIvf(spark, sf))
    val cosT = ranked(ops.SimilarityOps.simTopK(spark, sf))

    def check(sys: String, sysList: Map[Long, Seq[(Long, Long)]],
              truth: Map[Long, Seq[(Long, Long)]]): Unit =
      truth.keys.foreach { q =>
        val gains = truth(q).map { case (id, rn) => (id, K + 1L - rn) }.toMap
        val list = sysList.getOrElse(q, Seq.empty)
        val nRel = list.count { case (id, _) => gains.contains(id) }
        val frp = list.collect { case (id, rn) if gains.contains(id) => rn }
          .minOption.getOrElse(0L)
        val dcg = list.map { case (id, rn) =>
          gains.getOrElse(id, 0L) * disc(rn.toInt - 1)
        }.sum
        val (gN, gF, gD, gM, gNd) = got((sys, q))
        assert(gN == nRel && gF == frp && gD == dcg, s"$sys q$q counters")
        assert(gM == (if (frp == 0) 0L else 1000000L / frp), s"$sys q$q mrr")
        assert(gNd == dcg * 1000000L / idcgE9, s"$sys q$q ndcg")
        // integer nDCG tracks textbook float nDCG within LUT quantization
        val fDcg = list.map { case (id, rn) =>
          gains.getOrElse(id, 0L).toDouble / (math.log(rn + 1.0) / math.log(2.0))
        }.sum
        val fIdcg = (1 to K).map(i =>
          (K + 1 - i).toDouble / (math.log(i + 1.0) / math.log(2.0))).sum
        assert(math.abs(gNd / 1e6 - fDcg / fIdcg) < 1e-4, s"$sys q$q float ndcg drift")
      }

    check("lsh", lsh, cosT)
    check("mlsh", mlsh, cosT)
    check("ivf", ivf, cosT)
    // the IVF-PQ pair: ranked lists from the shared lane internals,
    // truth = exact L2 (the same counterpart 'adc' is scored against)
    val allB = ops.SimilarityOps.baseFor(spark, sf).persist()
    val k = ops.SimilarityOps.ivfKFor(allB.count())
    val ivfpq = ranked(ops.SimilarityOps.adcTopK(
      ops.SimilarityOps.ivfPqAdc(spark, allB, k)._2))
    val rivfpq = ranked(ops.SimilarityOps.adcTopK(
      ops.SimilarityOps.ivfPqResidualAdc(spark, allB, k)._2))
    val l2T = ranked(ops.SimilarityOps.pqSearchPartsB(
      spark, allB, ops.SimilarityOps.pqSeedBooks(allB))._2)
    allB.unpersist(false)
    check("ivfpq", ivfpq, l2T)
    check("rivfpq", rivfpq, l2T)
    // the multi-table fix measurably beats the single-table lane
    def meanNd(sys: String): Double = {
      val vs = got.collect { case ((s, _), v) if s == sys => v._5 }
      vs.sum.toDouble / vs.size / 1e6
    }
    info(f"mean nDCG@10: lsh ${meanNd("lsh")}%.3f mlsh ${meanNd("mlsh")}%.3f " +
      f"ivf ${meanNd("ivf")}%.3f adc ${meanNd("adc")}%.3f " +
      f"ivfpq ${meanNd("ivfpq")}%.3f rivfpq ${meanNd("rivfpq")}%.3f")
    // cell pruning must not collapse ADC quality: the combined index
    // stays in the full-corpus ADC's band (measured 0.48 vs 0.39 at
    // sf0.001 — pruning actually removes distant false positives)
    assert(meanNd("ivfpq") >= meanNd("adc") - 0.15,
      f"IVF pruning collapsed ADC quality: ${meanNd("ivfpq")}%.3f vs ${meanNd("adc")}%.3f")
    assert(meanNd("mlsh") > meanNd("lsh"),
      "multi-table LSH did not improve on single-table")
    // quality floor for the REGISTERED scale path (VERDICT r8 #1: the
    // lsh-family lane the registry points 100 TB traffic at must hold
    // mean nDCG@10 >= 0.3, the level q164 measured when it displaced
    // q39 from that role)
    assert(meanNd("mlsh") >= 0.3,
      f"registered ANN path quality floor: mlsh mean nDCG ${meanNd("mlsh")}%.3f < 0.3")
    // metric ranges + ADC floor (its candidate set is the whole corpus)
    got.values.foreach { case (_, _, _, mrr, nd) =>
      assert(mrr >= 0 && mrr <= 1000000 && nd >= 0 && nd <= 1000000)
    }
    val adcNd = got.collect { case ((s, _), v) if s == "adc" => v._5 }
    assert(adcNd.sum.toDouble / adcNd.size / 1e6 > 0.15,
      s"mean ADC nDCG suspiciously low: ${adcNd.mkString(",")}")
  }

  test("quality floors hold at sf0.1 — the trends survive cells filling (r11)") {
    // Floors re-based at the r13 EvalQueries=100 width. The old 25-/5-
    // query floors (ivf >= 0.7, measured 0.98) were inflated by
    // CENTROID-QUERY LEAKAGE: at sf0.1 the IVF kit has k = 32 cells
    // seeded from vec_id < 32, so queries vec_id < 25 were themselves
    // centroids and probed their own perfectly-aligned cells. At 100
    // queries the grid measures honest IVF recall (0.539 measured) —
    // the drop is the leakage leaving, not a regression. Deterministic
    // fixture => deterministic values; margins guard refactors.
    val rows = ops.SimilarityOps.rankMetrics(spark, "/root/testdata/sf0.1")
      .select("sys", "ndcg_e6").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def meanNd(sys: String): Double = {
      val vs = rows.collect { case (s, v) if s == sys => v }
      vs.sum.toDouble / vs.length / 1e6
    }
    info(f"sf0.1 mean nDCG@10: ivf ${meanNd("ivf")}%.3f " +
      f"mlsh ${meanNd("mlsh")}%.3f lsh ${meanNd("lsh")}%.3f " +
      f"rivfpq ${meanNd("rivfpq")}%.3f trivfpq ${meanNd("trivfpq")}%.3f")
    assert(meanNd("ivf") >= 0.45,
      f"ivf quality collapsed at sf0.1: ${meanNd("ivf")}%.3f < 0.45 (0.539 at r13)")
    assert(meanNd("mlsh") >= 0.5,
      f"registered ANN path floor at sf0.1: ${meanNd("mlsh")}%.3f < 0.5 (0.671 at r13)")
    assert(meanNd("mlsh") > meanNd("lsh"),
      "multi-table LSH did not improve on single-table at sf0.1")
    // the trained-book win IN THE LANE (r12 verdict #2): at the 100-
    // query width the corpus-scaled Lloyd ladder's residual books must
    // not lose to the seed books — the effect the 5-query grid provably
    // could not resolve (single-query swings > 0.5,
    // bench_evidence/r12_pq_budget.md; measured +0.004 at r13, the
    // same magnitude the r12 wide dev eval found)
    assert(meanNd("trivfpq") >= meanNd("rivfpq"),
      f"trained residual books lost to seed books in the lane: " +
        f"${meanNd("trivfpq")}%.3f < ${meanNd("rivfpq")}%.3f")
  }
}
