package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** q174 filtered-ANN properties:
  *  1. all ten output rows (mode × query) match an independent
  *     driver-side rerun — routing, probe sets at both probe counts,
  *     label post-filter, top-K vs the exact same-label truth;
  *  2. the lane measures the pre/post-filter trade it exists for:
  *     boosting probes never loses candidates or recall vs the base
  *     probe count (candidate supersets ⇒ kept supersets), and the
  *     post-filter keeps roughly 1/|labels| of the probed candidates;
  *  3. recall_millionths is consistent with n_overlap.
  */
class FilteredAnnSpec extends AnyFunSuite with SparkTestBase {

  private val NQ = SimilarityOps.NQueries
  private val Top = SimilarityOps.TopK
  private val Probes = SimilarityOps.IvfProbes
  private val Boost = SimilarityOps.FilterBoost

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def load(): Array[(Long, Array[Double], Long)] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
                 r.getInt(2).toLong))
      .sortBy(_._1)

  private def rerun(vecs: Array[(Long, Array[Double], Long)])
      : Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val k = SimilarityOps.ivfKFor(vecs.length.toLong)
    val nrm = vecs.map { case (id, v, _) => id -> math.sqrt(dot(v, v)) }.toMap
    val lbl = vecs.map { case (id, _, l) => id -> l }.toMap
    val cents = vecs.filter(_._1 < k)
    def cellRank(id: Long, v: Array[Double]): Seq[(Double, Long)] =
      cents.toSeq.map { case (cid, cv, _) =>
        (-dot(v, cv) / (nrm(id) * nrm(cid)), cid)
      }.sortBy(identity)
    val cellOf = vecs.map { case (id, v, _) => id -> cellRank(id, v).head._2 }.toMap

    def modeRows(tag: String, nProbes: Int) = (0 until NQ).map { qi =>
      val (qid, qv, qlbl) = vecs(qi)
      val probeCells = cellRank(qid, qv).take(nProbes).map(_._2).toSet
      val cand = vecs.filter { case (id, _, _) =>
        id != qid && probeCells.contains(cellOf(id))
      }
      val kept = cand.filter { case (id, _, _) => lbl(id) == qlbl }
      def cos(id: Long, v: Array[Double]) =
        r6(dot(qv, v) / (nrm(qid) * nrm(id)))
      val top = kept.toSeq.map { case (id, v, _) => (-cos(id, v), id) }
        .sortBy(identity).take(Top).map(_._2).toSet
      val truth = vecs.toSeq
        .filter { case (id, _, l) => id != qid && l == qlbl }
        .map { case (id, v, _) => (-cos(id, v), id) }
        .sortBy(identity).take(Top).map(_._2)
      val overlap = truth.count(top.contains).toLong
      (tag, qid, qlbl, cand.length.toLong, kept.length.toLong,
       overlap, overlap * 1000000L / Top)
    }
    modeRows("boost", Probes * Boost) ++ modeRows("post", Probes)
  }

  test("q174 rows match a full driver-side filtered-ANN rerun") {
    val got = SimilarityOps.filteredAnn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == rerun(load()))
  }

  test("probe boost recovers recall; the post-filter trade is measured") {
    val rows = rerun(load())
    val byMode = rows.groupBy(_._1)
    val post = byMode("post").sortBy(_._2)
    val boost = byMode("boost").sortBy(_._2)
    post.zip(boost).foreach { case (p, b) =>
      assert(b._4 >= p._4, s"qid ${p._2}: boost lost candidates")
      assert(b._5 >= p._5, s"qid ${p._2}: boost lost filtered candidates")
      assert(b._6 >= p._6, s"qid ${p._2}: boost lost recall")
    }
    def meanRecall(rs: Seq[(String, Long, Long, Long, Long, Long, Long)]) =
      rs.map(_._7).sum.toDouble / rs.size / 1e6
    info(f"mean filtered recall@$Top: post ${meanRecall(post)}%.2f " +
      f"(~${post.map(r => r._5.toDouble / r._4).sum / post.size * 100}%.0f%% of " +
      f"candidates survive the filter) -> boost ${meanRecall(boost)}%.2f")
    assert(meanRecall(boost) > meanRecall(post),
      "probe boosting did not improve filtered recall")
    rows.foreach { case (_, _, _, _, _, ov, rm) =>
      assert(rm == ov * 1000000L / Top)
    }
  }

  test("q183 partitioned pre-filter == q174 boost mode's KEPT set at the same probe budget (r11)") {
    // the (lbl, cell) layout changes WHERE candidates are read from
    // (label lists, pruned at the scan) — never WHAT is scored: its
    // candidate set must equal boost mode's post-filter survivors
    // exactly, with q183's n_cand equal to q174's n_kept (the cost the
    // layout saves is boost's n_cand - n_kept discarded reads)
    val part = SimilarityOps.partitionedFilteredAnn(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5),
                 r.getLong(6))).toSeq // (qid, qlbl, n_cand, n_overlap, recall)
    val q174 = SimilarityOps.filteredAnn(spark, sf).collect()
      .filter(_.getString(0) == "boost")
    val boostKept = q174.map(r => (r.getLong(1), r.getLong(2), r.getLong(4),
                 r.getLong(5), r.getLong(6))).toSeq // n_kept in n_cand's slot
    assert(part == boostKept,
      "pre-filter layout changed WHAT is scored, not just where it is read from")
    val saved = q174.map(r => r.getLong(3) - r.getLong(4)).sum
    assert(saved > 0,
      "boost mode discards nothing here — the layout comparison is vacuous at this sf")
    info(s"q183 reads ${q174.map(_.getLong(4)).sum} candidates where " +
      s"q174 boost scores ${q174.map(_.getLong(3)).sum} (saved $saved reads)")
  }
}
