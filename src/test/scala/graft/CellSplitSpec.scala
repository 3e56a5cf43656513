package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q198's split policy recomputed from scratch on the driver: routing
  * (argmin over the first-k centroids), the top-ceil(k/8) occupancy
  * ranking, min/max-id seed selection and cosine reassignment — plus
  * the structural invariants any index-maintenance pass must hold.
  */
class CellSplitSpec extends AnyFunSuite with SparkTestBase {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private lazy val corpus: Array[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  /** The full q198 chain, re-derived independently. */
  private lazy val expected: Seq[(Long, Long, Long, Long)] = {
    val k = math.min(50000L, math.max(16L, (corpus.length + 63) / 64L))
    val nrm = corpus.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val vec = corpus.toMap
    val cents = corpus.filter(_._1 < k)
    val assigned = corpus.map { case (id, v) =>
      val cell = cents.map { case (cid, cv) =>
        (-dot(v, cv) / (nrm(id) * nrm(cid)), cid)
      }.min._2
      id -> cell
    }
    val occ = assigned.groupBy(_._2).map { case (c, m) => c -> m.length.toLong }
    val nSplit = math.max(1L, k / 8)
    val chosen = occ.toSeq.sortBy { case (c, o) => (-o, c) }.take(nSplit.toInt)
    chosen.sortBy(_._1).map { case (cell, occBefore) =>
      val members = assigned.filter(_._2 == cell).map(_._1).sorted
      val (s0, s1) = (members.head, members.last)
      val subs = members.map { id =>
        val c0 = dot(vec(id), vec(s0)) / (nrm(id) * nrm(s0))
        val c1 = dot(vec(id), vec(s1)) / (nrm(id) * nrm(s1))
        if (c0 >= c1) 0L else 1L
      }
      (cell, occBefore, subs.count(_ == 0L).toLong, subs.count(_ == 1L).toLong)
    }
  }

  private lazy val got: Seq[(Long, Long, Long, Long)] =
    ops.SimilarityOps.cellSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("q198 output matches the independent driver-side recompute exactly") {
    assert(got == expected)
  }

  test("structural invariants: budget size, conservation, seed placement") {
    val k = math.min(50000L, math.max(16L, (corpus.length + 63) / 64L))
    assert(got.length == math.max(1L, k / 8).toInt, "rebalance budget drifted")
    got.foreach { case (cell, before, s0, s1) =>
      assert(s0 + s1 == before, s"cell $cell: members lost in the split")
      assert(s0 >= 1, s"cell $cell: min-id seed must land in sub 0")
    }
  }

  test("the split genuinely separates members (not everything collapses to sub 0)") {
    assert(got.exists(_._4 > 0),
      "every chosen cell sent all members to sub 0 — the seeds never separate anything")
  }

  test("chosen cells are the occupancy-heaviest under the deterministic tie rule") {
    val k = math.min(50000L, math.max(16L, (corpus.length + 63) / 64L))
    val nSplit = math.max(1L, k / 8).toInt
    val occAll = expected // already the top-nSplit, sorted by cell
    assert(occAll.length == nSplit)
    // the minimum chosen occupancy must be >= every unchosen occupancy
    // (with ties broken by cell id): verified inside `expected`'s
    // derivation; here assert the registered lane picked the SAME cells
    assert(got.map(_._1) == occAll.map(_._1))
  }
}
