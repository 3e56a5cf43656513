package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** q192 SQ8 properties the oracle can't state: the per-dim codes stay
  * in byte range with span-0 dims pinned, the reconstruction error
  * obeys the half-up quantization bound everywhere, and the measured
  * recall actually delivers SQ's bytes-for-quality promise over the
  * PQ seed books at the same TopK.
  */
class Sq8Spec extends AnyFunSuite with SparkTestBase {

  test("codes are bytes; every dim's reconstruction error is within the half-step bound") {
    val rows = SimilarityOps.sqEncodedFor(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, code, mn, sp) = (r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))
      assert(code >= 0 && code <= 255, s"code $code out of byte range")
      if (sp == 0.0) assert(code == 0L, "span-0 dim must pin to code 0")
      else {
        val dq = mn + code * sp / 255.0
        // half-up rounding: |x - dq| <= (sp/255)/2, plus float slack
        val bound = sp / 255.0 / 2.0 + 1e-9
        assert(math.abs(x - dq) <= bound,
          s"vec ${r.getLong(0)} dim ${r.getInt(1)}: |$x - $dq| > $bound")
      }
    }
  }

  test("corpus values sit inside their trained [min, max] (the stats really are per-dim)") {
    val bad = SimilarityOps.sqEncodedFor(spark, sf)
      .filter(org.apache.spark.sql.functions.expr(
        "x < mn - 1e-12 or x > mn + sp + 1e-12"))
      .count()
    assert(bad == 0L, s"$bad values escaped their per-dim range")
  }

  test("SQ8 (64 B/vec) beats the PQ seed books (8 B/vec) on measured recall@10") {
    def mean(df: org.apache.spark.sql.DataFrame): Double = {
      val xs = df.collect().map(_.getLong(2).toDouble / 1e6)
      xs.sum / xs.length
    }
    val sq = mean(SimilarityOps.sqSearch(spark, sf))
    val pq = mean(SimilarityOps.pqSearch(spark, sf))
    info(f"mean recall@10: SQ8 $sq%.2f vs PQ-seed $pq%.2f")
    assert(sq >= 0.8, f"SQ8 recall $sq%.2f below the 0.8 floor")
    assert(sq >= pq, "SQ8 with 8x the bytes should not lose to seed-book PQ")
  }
}
