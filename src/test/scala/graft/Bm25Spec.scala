package graft

import org.scalatest.funsuite.AnyFunSuite

/** BM25 (q132): the exact-rational scoring must agree with a
  * driver-side recomputation of the textbook formula, and the ranking
  * must behave like BM25 — rare-term hits outrank common-term ones.
  */
class Bm25Spec extends AnyFunSuite with SparkTestBase {

  private val terms = Seq("dup", "spark", "window")

  private lazy val result = ops.TextOps.bm25(spark, sf).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)

  test("scores match a driver-side recomputation of the rational form") {
    val n = docs.length.toLong
    val tt = docs.map(_._2.length.toLong).sum
    val dfm = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val contribs = terms.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else {
          val df = dfm(t)
          val num = (2L * n - 2L * df + 1L) * 22L * tf * tt
          val den = (2L * df + 1L) *
            (10L * tt * tf + 3L * tt + 9L * toks.length * n)
          Some(math.floor(num.toDouble / den.toDouble * 1e6).toLong)
        }
      }
      if (contribs.isEmpty) None
      else Some((id, contribs.length.toLong, contribs.sum))
    }.sortBy { case (id, _, s) => (-s, id) }.take(20)
    assert(result.toSeq == expected.toSeq)
  }

  test("ranking behaves like BM25: rare-term docs dominate the top") {
    assert(result.length == 20)
    // scores descend (ties broken by doc_id ascending)
    result.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
    }
    // 'dup' is ~15x rarer than the other terms, so its idf dominates:
    // the top hit must contain it
    val docText = docs.toMap
    assert(docText(result.head._1).contains("dup"), "top hit lacks the rare term")
    // every returned doc matched at least one query term
    result.foreach { case (id, nTerms, score) =>
      assert(nTerms >= 1 && score > 0)
      assert(terms.exists(docText(id).contains))
    }
  }
}
