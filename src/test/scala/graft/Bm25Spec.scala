package graft

import org.scalatest.funsuite.AnyFunSuite

/** BM25 (q132): the exact-rational scoring must agree with a
  * driver-side recomputation of the cleared-of-fractions formula
  * (BigInt products — the same exactness class as the engine's
  * DECIMAL(38,0) / DuckDB HUGEINT lanes), and the per-query ranking
  * must behave like a retrieval primitive.
  */
class Bm25Spec extends AnyFunSuite with SparkTestBase {

  private lazy val result = ops.TextOps.bm25(spark, sf).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)

  // the engine's term-derivation rule, recomputed independently:
  // first 3 docs × first 4 sorted distinct length>=4 tokens
  private lazy val qterms: Seq[(Long, String)] =
    docs.filter(_._1 < 3).toSeq.flatMap { case (qid, toks) =>
      toks.filter(_.length >= 4).distinct.sorted.take(4).map(qid -> _)
    }

  test("scores match a driver-side recomputation of the rational form") {
    val n = docs.length.toLong
    val tt = docs.map(_._2.length.toLong).sum
    val terms = qterms.map(_._2).distinct
    val dfm = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def contrib(toks: Seq[String], t: String): Option[Long] = {
      val tf = toks.count(_ == t).toLong
      if (tf == 0) None
      else {
        val df = dfm(t)
        val num = BigInt(2L * n - 2L * df + 1L) * 22 * BigInt(tf) * BigInt(tt)
        val den = BigInt(2L * df + 1L) *
          (BigInt(10L) * BigInt(tt) * BigInt(tf) + BigInt(3L) * BigInt(tt) +
            BigInt(9L) * BigInt(toks.length) * BigInt(n))
        Some(math.floor(num.toDouble / den.toDouble * 1e6).toLong)
      }
    }
    val expected = qterms.map(_._1).distinct.sorted.flatMap { qid =>
      val ts = qterms.filter(_._1 == qid).map(_._2)
      docs.flatMap { case (id, toks) =>
        val cs = ts.flatMap(contrib(toks, _))
        if (cs.isEmpty) None else Some((id, cs.length.toLong, cs.sum))
      }.sortBy { case (id, _, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, nt, s), i) => (qid, id, nt, s, i + 1L) }
    }
    assert(result.toSeq == expected.toSeq)
  }

  test("postings path and HOF path produce identical rankings, different plan shapes") {
    def run(usePostings: Boolean) = {
      val (lazyResult, toks) = ops.TextOps.bm25Lazy(spark, sf, usePostings)
      val plan = lazyResult.queryExecution.optimizedPlan.toString
      val rows = lazyResult.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      toks.unpersist(false)
      (rows.toSeq, plan)
    }
    val (hofRows, hofPlan) = run(usePostings = false)
    val (postRows, postPlan) = run(usePostings = true)
    assert(postRows == hofRows)
    // the postings path must actually explode token rows; the HOF path
    // must not (its per-term tf is an array scan, no Generate over toks)
    assert(postPlan.contains("Generate explode(toks"))
    assert(!hofPlan.contains("Generate explode(toks"))
  }

  test("per-query ranking behaves like a retrieval primitive") {
    val byQ = result.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    val docText = docs.toMap
    byQ.foreach { case (qid, rows) =>
      val ts = qterms.filter(_._1 == qid).map(_._2)
      assert(ts.nonEmpty && ts.length <= 4)
      // ranks are 1..k and scores descend with doc_id tiebreak
      assert(rows.map(_._5).toSeq == (1L to rows.length).toSeq)
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._2 < b._2))
        case _ =>
      }
      // every hit matched >=1 of this query's terms, n_terms bounded
      rows.foreach { case (_, id, nTerms, score, _) =>
        assert(nTerms >= 1 && nTerms <= ts.length && score > 0)
        assert(ts.exists(docText(id).contains))
      }
    }
  }
}
