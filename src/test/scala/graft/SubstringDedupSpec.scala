package graft

import org.scalatest.funsuite.AnyFunSuite

/** q151 exact-substring dedup verified against a brute-force oracle:
  * the longest common token run of every doc pair, computed by direct
  * DP over the raw texts. Two directions:
  *   - soundness: every reported (a, b, max_run_tokens) equals the
  *     true longest common run, and the run is >= SpanN;
  *   - completeness: every pair with a true common run >= SpanN is
  *     reported, unless ALL of its shared spans were df-capped (the
  *     documented boilerplate drop) — at this sf we assert the cap
  *     never fires, so completeness is exact.
  */
class SubstringDedupSpec extends AnyFunSuite with SparkTestBase {

  private def tokensOf(t: String): Array[String] = t.split(" ")

  /** Longest common contiguous substring (in tokens) via DP. */
  private def lcsRun(a: Array[String], b: Array[String]): Int = {
    val dp = Array.ofDim[Int](b.length + 1)
    var best = 0
    for (i <- 1 to a.length) {
      var prev = 0 // dp(j-1) from the previous row
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = if (a(i - 1) == b(j - 1)) prev + 1 else 0
        if (dp(j) > best) best = dp(j)
        prev = cur
      }
    }
    best
  }

  test("q151 pairs match the DP longest-common-run oracle, both directions") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokensOf(r.getString(1))).toMap

    // the df-cap must not fire at this sf for completeness to be exact
    val spanDf = Tables.documents(spark, sf)
      .selectExpr("explode(transform(sequence(1, greatest(size(split(text, ' ')) - 7, 0)), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i, 8)))) AS s")
      .groupBy("s").count()
      .agg(org.apache.spark.sql.functions.max("count")).collect()(0).getLong(0)
    assert(spanDf <= ops.DedupOps.SpanDfCap,
      s"df-cap fires at this sf (max span df $spanDf) — completeness check invalid")

    val reported = ops.DedupOps.substringDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(reported.nonEmpty, "no pairs reported at this sf")

    // soundness: reported max_run_tokens == DP truth
    reported.foreach { case ((a, b), run) =>
      val truth = lcsRun(texts(a), texts(b))
      assert(run == truth && run >= ops.DedupOps.SpanN,
        s"pair ($a,$b): reported run $run, DP truth $truth")
    }

    // completeness: every DP pair with run >= SpanN is reported
    val ids = texts.keys.toArray.sorted
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(j))
      val truth = lcsRun(texts(a), texts(b))
      if (truth >= ops.DedupOps.SpanN)
        assert(reported.contains((a, b)),
          s"pair ($a,$b) with true run $truth missing from q151")
    }
  }
}
