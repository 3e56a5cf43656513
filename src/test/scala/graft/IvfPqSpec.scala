package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** q171 IVF-ADC (IVF-PQ) properties:
  *  1. every output row (qid, n_cand, n_overlap, recall_millionths)
  *     matches a full independent driver-side rerun of the lane —
  *     coarse routing (argmin cell + top-probe cells), seed-book PQ
  *     codes, the floor-e6 integer LUT, ADC top-K over the pruned
  *     candidates, exact-L2 top-K over the FULL corpus, and the
  *     overlap — all in the production fold order;
  *  2. the coarse index actually PRUNES: each query's candidate count
  *     is well under the corpus size (the lane's reason to exist vs
  *     full-corpus ADC q157), with the measured pruning factor and
  *     recall reported.
  *
  * Geometry is derived from the lane's own constants (IvfProbes, PqM/
  * PqSub/PqK, NQueries, TopK) — the MultiLshSpec lesson: a constant
  * change must not silently leave the spec testing a different shape.
  */
class IvfPqSpec extends AnyFunSuite with SparkTestBase {

  private val M = SimilarityOps.PqM
  private val Sub = SimilarityOps.PqSub
  private val K = SimilarityOps.PqK
  private val NQ = SimilarityOps.NQueries
  private val Top = SimilarityOps.TopK
  private val Probes = SimilarityOps.IvfProbes

  /** Left-to-right fold from 0.0 — the vec_dot kernel's order. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def loadVecs(): Array[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)

  /** Independent rerun of the whole lane: (qid, n_cand, n_overlap,
    * recall_millionths) per query.
    */
  private def rerun(vecs: Array[(Long, Array[Double])]): Seq[(Long, Long, Long, Long)] = {
    val k = SimilarityOps.ivfKFor(vecs.length.toLong)
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val cents = vecs.filter(_._1 < k)
    def cellRank(id: Long, v: Array[Double]): Seq[(Double, Long)] =
      cents.toSeq.map { case (cid, cv) => (-dot(v, cv) / (nrm(id) * nrm(cid)), cid) }
        .sortBy(identity)
    val cellOf = vecs.map { case (id, v) => id -> cellRank(id, v).head._2 }.toMap
    val probesOf = vecs.filter(_._1 < NQ).map { case (id, v) =>
      id -> cellRank(id, v).take(Probes).map(_._2).toSet
    }.toMap

    val books = (0 until M).map { s =>
      vecs.take(K).toIndexedSeq.map { case (cid, cv) =>
        (cid, cv.slice(s * Sub, s * Sub + Sub))
      }
    }
    def codeOf(v: Array[Double], s: Int): Long = {
      val vSub = v.slice(s * Sub, s * Sub + Sub)
      val vv = dot(vSub, vSub)
      books(s).map { case (cid, cb) =>
        (vv - 2.0 * dot(vSub, cb) + dot(cb, cb), cid)
      }.minBy(identity)._2
    }
    val codes = vecs.map { case (id, v) =>
      id -> (0 until M).map(s => codeOf(v, s))
    }.toMap

    val lut = (for {
      (qid, qv) <- vecs.take(NQ).toSeq
      s <- 0 until M
      (cid, cb) <- books(s)
    } yield {
      var acc = 0.0; var j = 0
      while (j < Sub) { val dd = qv(s * Sub + j) - cb(j); acc += dd * dd; j += 1 }
      ((qid, s, cid), math.floor(acc * 1000000.0).toLong)
    }).toMap

    (0 until NQ).map { qi =>
      val (qid, qv) = vecs(qi)
      val cand = vecs.filter { case (id, _) =>
        id != qid && probesOf(qid).contains(cellOf(id))
      }
      val topAdc = cand.toSeq.map { case (id, _) =>
        (codes(id).zipWithIndex.map { case (c, s) => lut((qid, s, c)) }.sum, id)
      }.sortBy(identity).take(Top).map(_._2).toSet
      val qq = dot(qv, qv)
      val topExact = vecs.toSeq.filter(_._1 != qid).map { case (id, v) =>
        (r6(dot(v, v) - 2.0 * dot(qv, v) + qq), id)
      }.sortBy(identity).take(Top).map(_._2)
      val overlap = topExact.count(topAdc.contains).toLong
      (qid, cand.length.toLong, overlap, overlap * 1000000L / Top)
    }
  }

  test("q171 rows match a full driver-side IVF-PQ rerun") {
    val got = SimilarityOps.ivfPqSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = rerun(loadVecs())
    assert(got == want)
  }

  test("the coarse index prunes and the measured trade is reported") {
    val vecs = loadVecs()
    val rows = rerun(vecs)
    val n = vecs.length
    rows.foreach { case (qid, nCand, _, _) =>
      // probes/k of the cells ⇒ far fewer candidates than the corpus;
      // 2x slack over the expected share absorbs cell-size skew
      assert(nCand < n - 1, s"qid $qid: no pruning ($nCand of ${n - 1})")
      val expectedShare = Probes.toDouble / SimilarityOps.ivfKFor(n.toLong)
      assert(nCand <= n * expectedShare * 4 + K,
        s"qid $qid: candidate set $nCand way over the probes/k share")
    }
    val meanCand = rows.map(_._2).sum.toDouble / rows.size
    val meanRecall = rows.map(_._4).sum.toDouble / rows.size / 1e6
    info(f"corpus $n, mean candidates $meanCand%.1f " +
      f"(${n / meanCand}%.1fx pruning), mean recall@$Top $meanRecall%.2f")
    rows.foreach { case (_, _, ov, rm) => assert(rm == ov * 1000000L / Top) }
  }
}
