package graft

import org.scalatest.funsuite.AnyFunSuite

/** q205: the per-source quota recomputed independently, the weighting
  * proven to bite (longer docs overrepresented vs the corpus), and the
  * plan proven to run through the custom TopKPerKey operator.
  */
class SamplePerSourceSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs: Seq[(String, Long, Long)] =
    Tables.documents(spark, sf).selectExpr("source", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  private lazy val got: Seq[(String, Long, Long, Long)] =
    ops.TextOps.weightedSamplePerSource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("q205 matches an independent per-source priority recompute") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(sx: String): Long = {
      val hex = md.digest(sx.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x")
        .mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.map { case (_, id, nc) => (src, id, nc, h60(s"samp:$id") / nc) }
        .sortBy(r => (r._4, r._2)).take(3)
    }.sortBy(r => (r._1, r._4, r._2))
    assert(got == want)
  }

  test("the weighting bites: sampled docs are longer than the corpus average") {
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      f"sample mean $sampleMean%.0f <= corpus mean $corpusMean%.0f — " +
        "the weight never influenced selection")
  }

  test("the plan runs through the custom TopKPerKey operator") {
    val plan = ops.TextOps.weightedSamplePerSource(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom operator missing from:\n$plan")
  }
}
