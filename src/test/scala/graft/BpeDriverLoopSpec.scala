package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17: bpeTrainCore picks its merge-loop execution site by vocab row
  * count — a driver loop over the collected word-frequency table below
  * BpeDriverVocabCap (the fixture regime: per-round Spark jobs were
  * pure overhead over a 31-row relation), the original distributed
  * loop above it (the web-scale regime). The two paths must produce
  * the IDENTICAL merge table and the identical trained vocab — this
  * differential forces the distributed arm (cap = 0) against the
  * driver arm (default cap) on the same corpus and compares both
  * outputs row-for-row, keeping the distributed loop covered even
  * though every fixture vocab now takes the driver path.
  */
class BpeDriverLoopSpec extends AnyFunSuite with SparkTestBase {

  test("driver-loop and distributed merge paths agree exactly") {
    val d = "/root/testdata/sf0.001"
    val (mDrv, vocabDrv, hDrv) = ops.TextOps.bpeTrainCore(spark, d)
    val (mDist, vocabDist, hDist) =
      ops.TextOps.bpeTrainCore(spark, d, driverVocabCap = 0L)
    try {
      assert(mDrv == mDist, "merge tables diverged between the driver " +
        s"and distributed loops:\n driver: $mDrv\n dist:   $mDist")
      assert(mDrv.nonEmpty, "fixture produced no merges — vacuous test")
      val vd = vocabDrv.select("w", "cnt", "ws").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
      val vx = vocabDist.select("w", "cnt", "ws").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
      assert(vd == vx, "trained vocabs diverged between the paths")
    } finally {
      hDrv.unpersist(false)
      hDist.unpersist(false)
    }
  }
}
