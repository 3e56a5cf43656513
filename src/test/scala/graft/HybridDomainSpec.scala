package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential specs for the q158 hybrid-RRF fusion and the q159
  * per-domain cap: both are re-derived driver-side from first
  * principles (brute-force cosine ranking / explicit per-source sort)
  * and compared row-for-row against the distributed plans.
  */
class HybridDomainSpec extends AnyFunSuite with SparkTestBase {

  private val RrfK = 60L
  private val Scale = 1000000000L

  test("q158: fused rows match a driver-side RRF over independently derived rank lists") {
    val fused = ops.TextOps.hybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(fused.nonEmpty)
    // independent lexical ranks: the production BM25 lane (already
    // oracle-checked elsewhere) — only fusion arithmetic is under test
    val lex = ops.TextOps.bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // independent dense ranks: brute-force cosine on collected vectors
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      // mirror the plan's round(x, 6) before ranking
      BigDecimal(ab / (math.sqrt(aa) * math.sqrt(bb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val qids = fused.map(_._1).distinct.sorted
    val dense = qids.flatMap { qid =>
      vecs.toSeq.map { case (id, v) => (id, cos(vecs(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).zipWithIndex
        .map { case ((id, _), i) => (qid, id) -> (i + 1).toLong }
    }.toMap
    val expected = qids.flatMap { qid =>
      val cands = (lex.keySet ++ dense.keySet).filter(_._1 == qid).map(_._2)
      cands.toSeq.map { id =>
        val rl = lex.get((qid, id)).getOrElse(Scale)
        val rd = dense.get((qid, id)).getOrElse(Scale)
        val score = Scale / (RrfK + rl) + Scale / (RrfK + rd)
        val n = (if (rl != Scale) 1L else 0L) + (if (rd != Scale) 1L else 0L)
        (qid, id, score, n)
      }.sortBy { case (_, id, score, _) => (-score, id) }.take(10).zipWithIndex
        .map { case ((q, id, score, n), i) => (q, id, score, n, (i + 1).toLong) }
    }
    assert(fused.sortBy(t => (t._1, t._5)).toSeq === expected.sortBy(t => (t._1, t._5)).toSeq)
    // the query doc tops the dense list (cos = 1 with itself), which
    // alone outscores every single-list candidate; on this corpus no
    // dual-list candidate overtakes it (verified by the differential
    // above), so it tops the fused list
    qids.foreach { qid =>
      val top = fused.filter(t => t._1 == qid && t._5 == 1L).head
      assert(top._2 == qid,
        s"qid=$qid fused top-1 should be the query doc, got $top")
    }
  }

  test("q159: per-source admission matches an explicit hash-priority sort; caps exact") {
    val audit = ops.TextOps.domainCap(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(audit.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
              graft.functions.HashFns.hash64(
                concat(lit("cap:"), col("doc_id").cast("string"))).as("pri"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = docs.groupBy(_._2)
    assert(audit.map(_._1).toSet === bySource.keySet)
    audit.foreach { case (src, nTotal, nKept, nDropped, checksum) =>
      val all = bySource(src)
      assert(nTotal == all.length.toLong)
      assert(nKept == math.min(nTotal, 20L))
      assert(nDropped == nTotal - nKept)
      val expectKept = all.sortBy(t => (t._3, t._1)).take(20).map(_._1)
      assert(checksum == expectKept.sum,
        s"source=$src kept-set checksum mismatch (admission order diverged)")
    }
  }
}
