package graft

import org.scalatest.funsuite.AnyFunSuite

/** Measured error bound for q132's documented BM25 simplification
  * (idf log dropped for integer-exact cross-engine determinism —
  * COVERAGE.md). The claim "rankings stay close to textbook BM25" is
  * asserted here as numbers: per query, Spearman rank correlation over
  * the full candidate set and top-10 overlap between the rational-idf
  * production lane and textbook Okapi BM25 (k1=1.2, b=0.75, Lucene
  * log-idf), both computed from the SAME per-term relation
  * (TextOps.bm25DualScores) so only the scoring formula differs.
  */
class Bm25FidelitySpec extends AnyFunSuite with SparkTestBase {

  private val SpearmanFloor = 0.90
  private val Top10OverlapFloor = 0.70

  test("rational-idf BM25 tracks textbook BM25: Spearman + top-10 overlap per query") {
    val rows = ops.TextOps.bm25DualScores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, docs) =>
      // rank both lanes with the production tiebreak (score desc, doc asc)
      def rankOf(score: ((Long, Long, Double, Double)) => Double): Map[Long, Int] =
        docs.sortBy(t => (-score(t), t._2)).zipWithIndex
          .map { case (t, i) => t._2 -> (i + 1) }.toMap
      val rRank = rankOf(_._3)
      val tRank = rankOf(_._4)
      val n = docs.length
      assume(n >= 10, s"qid=$qid candidate set too small to be meaningful ($n)")
      val d2 = docs.map(t => { val d = rRank(t._2) - tRank(t._2); d.toLong * d }).sum
      val rho = 1.0 - 6.0 * d2 / (n.toLong * (n.toLong * n.toLong - 1))
      val top10R = docs.sortBy(t => (-t._3, t._2)).take(10).map(_._2).toSet
      val top10T = docs.sortBy(t => (-t._4, t._2)).take(10).map(_._2).toSet
      val overlap = top10R.intersect(top10T).size / 10.0
      info(f"qid=$qid n=$n spearman=$rho%.4f top10_overlap=$overlap%.1f")
      assert(rho >= SpearmanFloor,
        f"qid=$qid: Spearman $rho%.4f below floor $SpearmanFloor (n=$n)")
      assert(overlap >= Top10OverlapFloor,
        f"qid=$qid: top-10 overlap $overlap%.1f below floor $Top10OverlapFloor")
    }
  }
}
