package graft

import org.scalatest.funsuite.AnyFunSuite

/** q155 product-quantization properties verified against a driver-side
  * recomputation: every (vector, subspace) code is the true argmin over
  * the 16 sub-centroids (squared L2, cid tie-break), the reported error
  * matches, and total reconstruction error is therefore no worse than
  * any fixed single-centroid assignment.
  */
class PqCodesSpec extends AnyFunSuite with SparkTestBase {

  test("q155 codes are per-subspace argmins with exact errors") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val cents = vecs.filter(_._1 < 16).toArray.sortBy(_._1)
    val rows = ops.SimilarityOps.pqCodes(spark, sf).collect()
    assert(rows.length == vecs.size * 8)

    rows.foreach { r =>
      val (id, s, code, errE6) =
        (r.getLong(0), r.getLong(1).toInt, r.getLong(2), r.getLong(3))
      val v = vecs(id)
      // the production Cauchy-expansion form, same fold order
      val dists = cents.map { case (cid, cv) =>
        var vv = 0.0; var vc = 0.0; var cc = 0.0
        for (j <- 0 until 8) {
          val x = v(s * 8 + j); val c = cv(s * 8 + j)
          vv += x * x; vc += x * c; cc += c * c
        }
        (vv - 2.0 * vc + cc, cid)
      }
      val (bestD, bestC) = dists.minBy(identity)
      assert(code == bestC, s"vec $id sub $s: code $code, argmin $bestC")
      assert(errE6 == math.floor(bestD * 1e6).toLong,
        s"vec $id sub $s: err $errE6 vs ${math.floor(bestD * 1e6).toLong}")
    }
  }

  test("q157 ADC recall beats chance and clears per-query floors") {
    val rows = ops.SimilarityOps.pqSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 5)
    val n = Tables.embeddings(spark, sf).count()
    // expected chance overlap of two independent 10-sets from n
    val chance = 10.0 * 10.0 / n
    rows.foreach { case (qid, overlap, recall) =>
      assert(overlap >= 1L, s"qid=$qid: ADC top-10 missed the exact top-10 entirely")
      assert(recall == overlap * 100000L)
    }
    val mean = rows.map(_._2).sum.toDouble / rows.length
    info(f"mean ADC top-10 overlap $mean%.1f vs chance $chance%.2f (n=$n)")
    assert(mean >= 2.0, f"mean overlap $mean%.1f below floor 2.0")
    assert(mean > 4 * chance, "ADC not convincingly above chance")
  }
}
