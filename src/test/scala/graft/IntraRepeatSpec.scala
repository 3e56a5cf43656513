package graft

import org.scalatest.funsuite.AnyFunSuite

/** q156 intra-doc repeated spans verified against a brute-force oracle:
  * the longest self-repeated token run of every doc, computed by direct
  * offset scanning over the raw text (for every offset d >= 1, the
  * longest run of a(i) == a(i+d)). Soundness of every reported
  * max_repeat_run, completeness of every doc whose true longest repeat
  * reaches RepeatN — exact because the occurrence cap must not fire at
  * this sf (asserted).
  */
class IntraRepeatSpec extends AnyFunSuite with SparkTestBase {

  /** Longest token run appearing at least twice (at distinct offsets). */
  private def longestRepeat(a: Array[String]): Int = {
    var best = 0
    for (d <- 1 until a.length) {
      var run = 0
      for (i <- 0 until a.length - d) {
        if (a(i) == a(i + d)) { run += 1; if (run > best) best = run }
        else run = 0
      }
    }
    best
  }

  test("q156 matches the brute-force longest-self-repeat oracle, both directions") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap

    val n = ops.DedupOps.RepeatN
    // occurrence cap must not fire for completeness to be exact
    val maxOcc = Tables.documents(spark, sf)
      .selectExpr(("explode(transform(sequence(1, greatest(size(split(text, ' ')) - " +
        s"${n - 1}, 0)), i -> concat_ws(' ', slice(split(text, ' '), i, $n)))) AS s"),
        "doc_id")
      .groupBy("doc_id", "s").count()
      .agg(org.apache.spark.sql.functions.max("count")).collect()(0).getLong(0)
    assert(maxOcc <= 10, s"occurrence cap fires at this sf (max occ $maxOcc)")

    val reported = ops.DedupOps.intraRepeat(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(reported.nonEmpty, "no intra-repeat docs at this sf")

    reported.foreach { case (id, run) =>
      val truth = longestRepeat(texts(id))
      assert(run == truth && run >= n,
        s"doc $id: reported longest repeat $run, oracle $truth")
    }
    texts.foreach { case (id, toks) =>
      if (longestRepeat(toks) >= n)
        assert(reported.contains(id), s"doc $id with repeat missing from q156")
    }
  }
}
