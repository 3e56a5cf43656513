package graft

import org.scalatest.funsuite.AnyFunSuite

/** q165/q166 PQ-training properties:
  *  1. the full corpus-scaled-round audit matches an independent
  *     driver-side Lloyd recomputation (same Cauchy fold, same
  *     quantized means, same tie-breaks, same pqTrainRoundsFor ladder)
  *     — every (round, s, code, n_members, err_e6) row;
  *  2. the loop audit is monotone (Lloyd: total assignment error never
  *     increases round over round, up to the 1e-6 mean quantization)
  *     and PLATEAUS: the last round's improvement is at most half the
  *     first's;
  *  3. round 1 equals q160's old-side audit (the single-refinement lane
  *     and the loop agree on their shared first step);
  *  4. trained-vs-seed ADC retrieval quality is asserted at a WIDE
  *     query set (100 queries, driver-side exact recompute): the
  *     registered lanes eval at NQueries = 5, where single-query
  *     swings exceed the whole effect size (the r11 grid "inversion"
  *     — bench_evidence/r12_pq_budget.md); at 100 queries trained
  *     books must not lose to seed books.
  */
class PqTrainSpec extends AnyFunSuite with SparkTestBase {

  private val M = 8; private val Sub = 8; private val K = 16
  private lazy val Rounds =
    ops.SimilarityOps.pqTrainRoundsFor(Tables.embeddings(spark, sf).count())

  private def loadVecs(): Array[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)

  /** Subspace squared-L2 in the production fold order (vv − 2·vc + cc,
    * each accumulated left-to-right — the PqRefineSpec-proven twin of
    * the vec_dot kernel).
    */
  private def subDist(v: Array[Double], sub: Array[Double], s: Int): Double = {
    var vv = 0.0; var vc = 0.0; var cc = 0.0
    for (j <- 0 until Sub) {
      val x = v(s * Sub + j); val y = sub(j)
      vv += x * x; vc += x * y; cc += y * y
    }
    vv - 2.0 * vc + cc
  }

  /** Full driver-side rerun of the bounded Lloyd loop: per-round audit
    * rows keyed (round, s, code) -> (n, err_e6).
    */
  private def rerun(vecs: Array[(Long, Array[Double])])
      : Map[(Long, Long, Long), (Long, Long)] = {
    var books: IndexedSeq[IndexedSeq[(Long, Array[Double])]] =
      (0 until M).map { s =>
        vecs.take(K).toIndexedSeq.map { case (cid, cv) =>
          (cid, cv.slice(s * Sub, s * Sub + Sub))
        }
      }
    val audit = Map.newBuilder[(Long, Long, Long), (Long, Long)]
    for (r <- 1 to Rounds) {
      // assignment under books_{r-1}, min (dist, code)
      val asg = for ((id, v) <- vecs; s <- 0 until M) yield {
        val (d, cid) = books(s)
          .map { case (cid, sub) => (subDist(v, sub, s), cid) }
          .minBy { case (d, cid) => (d, cid) }
        (id, s, cid, d, v)
      }
      asg.groupBy { case (_, s, cid, _, _) => (s, cid) }.foreach {
        case ((s, cid), rows) =>
          val err = rows.map { case (_, _, _, d, _) =>
            math.floor(d * 1e6).toLong }.sum
          audit += ((r.toLong, s.toLong, cid) -> (rows.length.toLong, err))
      }
      // quantized-mean update
      books = (0 until M).map { s =>
        asg.filter(a => a._2 == s).groupBy(_._3).map { case (cid, rows) =>
          val sub = Array.tabulate(Sub) { j =>
            val q = rows.map { case (_, _, _, _, v) =>
              math.floor(v(s * Sub + j) * 1e6).toLong }.sum
            (q.toDouble / 1e6) / rows.length
          }
          (cid, sub)
        }.toIndexedSeq.sortBy(_._1)
      }
    }
    audit.result()
  }

  test("q165 audit matches a driver-side Lloyd rerun; monotone; plateaus") {
    val got = ops.SimilarityOps.pqTrain(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
                 (r.getLong(3), r.getLong(4)))).toMap
    val want = rerun(loadVecs())
    assert(got.keySet == want.keySet, "audit row set")
    got.foreach { case (k, v) => assert(v == want(k), s"audit row $k") }

    val tot = (1 to Rounds).map(r =>
      got.collect { case ((rr, _, _), (_, e)) if rr == r => e }.sum)
    info(s"per-round total err_e6: ${tot.mkString(" -> ")}")
    val nAsg = got.collect { case ((1L, _, _), (n, _)) => n }.sum
    // monotone up to quantization (each floor-e6 term can under-read by
    // <1 unit; nAsg terms bound the drift)
    (1 until Rounds).foreach { i =>
      assert(tot(i) <= tot(i - 1) + nAsg, s"round ${i + 1} error increased")
    }
    val d1 = tot(0) - tot(1); val dLast = tot(Rounds - 2) - tot(Rounds - 1)
    assert(dLast * 2 <= d1,
      s"no plateau: first delta $d1, last delta $dLast")

    // round 1 == q160's old-side audit (shared first step)
    val old = ops.SimilarityOps.pqRefine(spark, sf).collect()
      .filter(_.getLong(2) > 0) // n_old > 0: rows present in the old assignment
      .map(r => ((1L, r.getLong(0), r.getLong(1)),
                 (r.getLong(2), r.getLong(3)))).toMap
    assert(got.filter(_._1._1 == 1L) == old, "round 1 vs q160 old stats")
  }

  test("q166 measures trained-books ADC recall against the q157 seed books") {
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val xs = df.collect().map(_.getLong(1))
      xs.sum.toDouble / (xs.length * 10)
    }
    val seed = recall(ops.SimilarityOps.pqSearch(spark, sf))
    val trained = recall(ops.SimilarityOps.pqSearchTrained(spark, sf))
    // measured, not asserted: 5 queries x 10 judgments — single-query
    // swings exceed any training effect (the wide-eval test below is
    // the assertion surface)
    info(f"ADC top-10 recall (5-query lane eval): seed $seed%.2f -> " +
      f"trained $trained%.2f")
    assert(seed >= 0 && seed <= 1 && trained >= 0 && trained <= 1)
  }

  /** Driver-side ADC top-10 recall vs exact L2 over a WIDE query set —
    * the eval width the budget question actually needs.
    */
  private def recallWide(vecs: Array[(Long, Array[Double])],
                         books: IndexedSeq[IndexedSeq[(Long, Array[Double])]],
                         nq: Int): Double = {
    val codes: Map[Long, IndexedSeq[Long]] = vecs.map { case (id, v) =>
      id -> (0 until M).map { s =>
        books(s).minBy { case (cid, sub) => (subDist(v, sub, s), cid) }._1
      }
    }.toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val queries = vecs.filter(_._1 < nq)
    queries.map { case (qid, qv) =>
      val lut: IndexedSeq[Map[Long, Long]] = (0 until M).map { s =>
        books(s).map { case (cid, sub) =>
          cid -> math.floor(subDist(qv, sub, s) * 1e6).toLong }.toMap
      }
      val others = vecs.filter(_._1 != qid)
      val adcTop = others.map { case (id, _) =>
        (id, (0 until M).map(s => lut(s)(codes(id)(s))).sum)
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      val exactTop = others.map { case (id, v) => (id, l2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      (adcTop & exactTop).size.toDouble / 10.0
    }.sum / queries.length
  }

  test("wide-eval (100 queries): trained books do not lose to seed books " +
       "at the corpus-scaled budget (r11 verdict #2)") {
    val vecs = loadVecs()
    val all = ops.SimilarityOps.baseFor(spark, sf).persist()
    val seedBooks = ops.SimilarityOps.pqSeedBooks(all)
    val (trainedBooks, _) = ops.SimilarityOps.pqTrainCore(all,
      rounds = ops.SimilarityOps.pqTrainRoundsFor(all.count()))
    all.unpersist(false)
    val nq = math.min(100, vecs.length / 2)
    val rSeed = recallWide(vecs, seedBooks, nq)
    val rTrained = recallWide(vecs, trainedBooks, nq)
    info(f"wide-eval recall@10 over $nq queries: seed $rSeed%.3f -> " +
      f"trained $rTrained%.3f")
    assert(rTrained >= rSeed - 0.02,
      f"trained books lost to seed books at wide eval: $rSeed%.3f -> $rTrained%.3f")
  }

  test("q169 leakage control: seed-vs-trained recall under leaked and held-out seeds") {
    def recall(parts: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)): Double = {
      val (adc, exact) = parts
      val hits = exact.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = adc.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      got.count(hits.contains).toDouble / hits.size
    }
    val all = ops.SimilarityOps.baseFor(spark, sf).persist()
    val leakedSeed = recall(ops.SimilarityOps.pqSearchPartsB(
      spark, all, ops.SimilarityOps.pqSeedBooks(all)))
    val (leakedBooks, _) = ops.SimilarityOps.pqTrainCore(all,
      rounds = ops.SimilarityOps.pqTrainRoundsFor(all.count()))
    val leakedTrained = recall(ops.SimilarityOps.pqSearchPartsB(spark, all, leakedBooks))
    val holdSeed = recall(ops.SimilarityOps.pqSearchPartsB(
      spark, all, ops.SimilarityOps.pqSeedBooks(all, 5L)))
    val (holdBooks, _) = ops.SimilarityOps.pqTrainCore(all, 5L,
      rounds = ops.SimilarityOps.pqTrainRoundsFor(all.count()))
    val holdTrained = recall(ops.SimilarityOps.pqSearchPartsB(spark, all, holdBooks))
    all.unpersist(false)
    info(f"recall@10: leaked seed $leakedSeed%.2f -> trained $leakedTrained%.2f; " +
      f"held-out seed $holdSeed%.2f -> trained $holdTrained%.2f")
    // the 2x2 exists to MEASURE the leakage mechanism; the only hard
    // assertions are sanity bounds (5 queries x 10 judgments is noisy)
    Seq(leakedSeed, leakedTrained, holdSeed, holdTrained).foreach { r =>
      assert(r >= 0 && r <= 1)
    }
  }

  test("trained-books ADC nDCG@10 vs exact L2 (the q163 'adc' fold, re-measured)") {
    // same literal log2-discount LUT as q163, driver-side
    val disc = (1 to 10).map(p => 1.0 / (math.log(p + 1.0) / math.log(2.0)))
    val idcg = (1 to 10).map(i => (10 + 1 - i) * disc(i - 1)).sum
    def ndcg(sys: org.apache.spark.sql.DataFrame,
             truth: org.apache.spark.sql.DataFrame): Double = {
      val g = truth.collect()
        .map(r => ((r.getLong(0), r.getLong(1)), 11L - r.getLong(2))).toMap
      val byQ = sys.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      val qs = g.keys.map(_._1).toSeq.distinct
      qs.map { q =>
        byQ.getOrElse(q, Array.empty).map { case (_, id, rn) =>
          g.getOrElse((q, id), 0L) * disc(rn.toInt - 1)
        }.sum / idcg
      }.sum / qs.size
    }
    val all = ops.SimilarityOps.baseFor(spark, sf).persist()
    val (books, _) = ops.SimilarityOps.pqTrainCore(all,
      rounds = ops.SimilarityOps.pqTrainRoundsFor(all.count()))
    val (seedAdc, exact) =
      ops.SimilarityOps.pqSearchPartsB(spark, all, ops.SimilarityOps.pqSeedBooks(all))
    val ndSeed = ndcg(seedAdc, exact)
    val (trAdc, trExact) = ops.SimilarityOps.pqSearchPartsB(spark, all, books)
    val ndTrained = ndcg(trAdc, trExact)
    all.unpersist(false)
    info(f"mean ADC nDCG@10 vs exact L2: seed $ndSeed%.3f -> trained $ndTrained%.3f")
    assert(ndTrained >= 0 && ndTrained <= 1)
  }
}
