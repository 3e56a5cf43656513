package graft

import org.scalatest.funsuite.AnyFunSuite

/** q199 recomputed from scratch on the driver: the before-routing, the
  * q198 split decision, the post-split kit, the exact re-route, both
  * probe/score/rank passes and the balance metrics — plus the
  * fixture-level regression guards (balance must improve, recall must
  * not silently change) that make the lane's story checkable.
  */
class SplitServingSpec extends AnyFunSuite with SparkTestBase {

  private val NQ = 5
  private val TopK = 10
  private val Probes = 2

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val corpus: Array[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  /** Independent recompute of the whole q199 chain. */
  private lazy val expected: Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val k = math.min(50000L, math.max(16L, (corpus.length + 63) / 64L))
    val vec = corpus.toMap
    val nrm = corpus.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap

    def route(cents: Seq[(Long, Array[Double])]): (Map[Long, Long], Map[Long, Seq[Long]]) = {
      val assigned = corpus.map { case (id, v) =>
        id -> cents.map { case (cid, cv) =>
          (-dot(v, cv) / (nrm(id) * nrm(cid)), cid)
        }.min._2
      }.toMap
      val probes = corpus.filter(_._1 < NQ).map { case (qid, qv) =>
        qid -> cents.map { case (cid, cv) =>
          (-dot(qv, cv) / (nrm(qid) * nrm(cid)), cid)
        }.sorted.take(Probes).map(_._2).toSeq
      }.toMap
      (assigned, probes)
    }

    val centsB = corpus.filter(_._1 < k).toSeq
    val (asgB, prbB) = route(centsB)

    // q198 split decision
    val occB = asgB.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    val nSplit = math.max(1L, k / 8)
    val chosen = occB.toSeq.sortBy { case (c, o) => (-o, c) }
      .take(nSplit.toInt).map(_._1).toSet
    val seedIds = chosen.toSeq.flatMap { c =>
      val members = asgB.filter(_._2 == c).keys.toSeq.sorted
      Seq(members.head, members.last)
    }.distinct
    val centsA = centsB.filterNot(p => chosen(p._1)) ++
      seedIds.map(id => id -> vec(id))
    val (asgA, prbA) = route(centsA)

    // exact truth
    val truth = (0L until NQ).map { qid =>
      qid -> corpus.filter(_._1 != qid).map { case (id, v) =>
        (round6(dot(vec(qid), v) / (nrm(qid) * nrm(id))), id)
      }.sortBy { case (c, id) => (-c, id) }.take(TopK).map(_._2).toSet
    }.toMap

    def phase(tag: String, asg: Map[Long, Long], prb: Map[Long, Seq[Long]]) = {
      val occ = asg.groupBy(_._2).map { case (_, m) => m.size.toLong }
      val maxOcc = occ.max
      val occSq = occ.map(o => o * o).sum
      (0L until NQ).map { qid =>
        val cells = prb(qid).toSet
        val cand = corpus.filter { case (id, _) =>
          id != qid && cells(asg(id))
        }
        val top = cand.map { case (id, v) =>
          (round6(dot(vec(qid), v) / (nrm(qid) * nrm(id))), id)
        }.sortBy { case (c, id) => (-c, id) }.take(TopK).map(_._2).toSet
        val overlap = top.count(truth(qid))
        (tag, qid, cand.length.toLong, overlap.toLong,
          overlap.toLong * 1000000 / TopK, maxOcc, occSq)
      }
    }
    phase("after", asgA, prbA) ++ phase("before", asgB, prbB)
  }

  private lazy val got: Seq[(String, Long, Long, Long, Long, Long, Long)] =
    ops.SimilarityOps.splitServing(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("q199 output matches the independent driver-side recompute exactly") {
    assert(got == expected)
  }

  test("the split improves index balance on the registered fixture") {
    // a fixture-level regression guard (exact re-routing does not
    // GUARANTEE monotone balance in general): the split exists to
    // reduce hot-cell cost, and on this corpus it must
    val before = got.filter(_._1 == "before").head
    val after = got.filter(_._1 == "after").head
    assert(after._7 < before._7, "sum(occ^2) did not drop — the split bought nothing")
    assert(after._6 <= before._6, "max occupancy grew under the split")
  }

  test("recall does not silently regress on the registered fixture") {
    val before = got.filter(_._1 == "before").map(t => t._2 -> t._4).toMap
    val after = got.filter(_._1 == "after").map(t => t._2 -> t._4).toMap
    val drop = before.keys.map(q => before(q) - after(q)).sum
    assert(drop <= 1,
      s"post-split recall dropped by $drop hits across $NQ queries — " +
        "regenerate or re-judge the split policy")
  }
}
