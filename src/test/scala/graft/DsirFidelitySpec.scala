package graft

import org.scalatest.funsuite.AnyFunSuite

/** Measured error bound for q152's documented DSIR simplification:
  * the production weight is the integer-exact MEAN per-gram importance
  * ratio (cross-engine deterministic), the textbook DSIR weight is the
  * mean per-gram LOG ratio. Both are computed from the same gram
  * relation (TextOps.dsirDualScores) so only the arithmetic differs;
  * this spec asserts the rank agreement as numbers (the un-normalized
  * ratio SUM was measured at Spearman -0.999 against log-DSIR — length
  * domination — which is why the mean is the shipped semantics).
  */
class DsirFidelitySpec extends AnyFunSuite with SparkTestBase {

  private val SpearmanFloor = 0.95
  private val Top10OverlapFloor = 0.80

  test("integer mean-ratio DSIR tracks mean-log DSIR: Spearman + top-10 overlap") {
    val rows = ops.TextOps.dsirDualScores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = rows.length
    assert(n >= 20, s"corpus too small to be meaningful ($n docs)")

    def rankOf(key: ((Long, Long, Double)) => Double): Map[Long, Int] =
      rows.sortBy(t => (-key(t), t._1)).zipWithIndex
        .map { case (t, i) => t._1 -> (i + 1) }.toMap
    val iRank = rankOf(_._2.toDouble)
    val lRank = rankOf(_._3)
    val d2 = rows.map { t =>
      val d = iRank(t._1) - lRank(t._1); d.toLong * d
    }.sum
    val rho = 1.0 - 6.0 * d2 / (n.toLong * (n.toLong * n.toLong - 1))
    val topI = rows.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val topL = rows.sortBy(t => (-t._3, t._1)).take(10).map(_._1).toSet
    val overlap = topI.intersect(topL).size / 10.0
    info(f"n=$n spearman=$rho%.4f top10_overlap=$overlap%.1f")
    assert(rho >= SpearmanFloor,
      f"Spearman $rho%.4f below floor $SpearmanFloor (n=$n)")
    assert(overlap >= Top10OverlapFloor,
      f"top-10 overlap $overlap%.1f below floor $Top10OverlapFloor")
  }
}
