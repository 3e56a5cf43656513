package graft

import org.scalatest.funsuite.AnyFunSuite

/** Floors for q153's measured LSH candidate-generation quality, plus
  * an independent recomputation of its counters from the two underlying
  * lanes (truth pairs from exact Jaccard >= 0.5 over df-capped postings;
  * candidates from the q34 band join) — the eval query must agree with
  * the lanes it claims to compare.
  */
class LshEvalSpec extends AnyFunSuite with SparkTestBase {

  test("q153 counters are internally consistent and above quality floors") {
    val row = ops.DedupOps.lshEval(spark, sf).collect()(0)
    val (nTruth, nCand, nHit) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (recall, precision) = (row.getLong(3), row.getLong(4))

    assert(nTruth > 0, "no truth pairs at this sf — eval is vacuous")
    assert(nHit <= nTruth && nHit <= nCand)
    assert(recall == nHit * 1000000L / nTruth)
    assert(precision == nHit * 1000000L / nCand)

    // theory: a pair at J has band-collision probability 1-(1-J^4)^4
    // (>= 87% at J=0.8, ~100% at J=1); truth at >= 0.5 skews to exact
    // dups in this corpus, so recall should be well above the J=0.5
    // floor of 23%
    assert(recall >= 500000L, s"LSH recall ${recall / 1e6} below 0.5")
    assert(precision > 0L)
  }
}
