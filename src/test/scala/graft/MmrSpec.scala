package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** q176 MMR properties:
  *  1. all 50 output rows match an independent driver-side greedy
  *     rerun (pool, integer quantization, maxsim-to-selected, argmax
  *     tie-breaks);
  *  2. MMR does what it exists for: the mean pairwise similarity
  *     WITHIN the selected 10 is strictly lower than within the plain
  *     relevance top-10, while pick 1 equals the relevance argmax;
  *  3. score_e6 = rel_e6 − maxsim_e6 on every row.
  */
class MmrSpec extends AnyFunSuite with SparkTestBase {

  private val NQ = SimilarityOps.NQueries
  private val Top = SimilarityOps.TopK
  private val Pool = SimilarityOps.MmrPool

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def e6(x: Double): Long = math.round(r6(x) * 1000000.0)

  private def loadVecs(): Array[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)

  /** (per-query relevance pool desc, pairwise sim lookup) */
  private def poolFor(vecs: Array[(Long, Array[Double])], qid: Long)
      : (Seq[(Long, Long)], Map[(Long, Long), Long]) = {
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = vecs.toMap
    val qv = byId(qid)
    val pool = vecs.toSeq.filter(_._1 != qid)
      .map { case (id, v) => (-r6(dot(qv, v) / (nrm(qid) * nrm(id))), id) }
      .sortBy(identity).take(Pool)
      .map { case (negRel, id) => (id, math.round(-negRel * 1000000.0)) }
    val sims = (for {
      (a, _) <- pool; (b, _) <- pool if a != b
    } yield (a, b) -> e6(dot(byId(a), byId(b)) / (nrm(a) * nrm(b)))).toMap
    (pool, sims)
  }

  private def rerun(vecs: Array[(Long, Array[Double])])
      : Seq[(Long, Long, Long, Long, Long, Long)] =
    (0L until NQ.toLong).flatMap { qid =>
      val (pool, sims) = poolFor(vecs, qid)
      val rel = pool.toMap
      var selected = Vector.empty[Long]
      (1 to Top).map { r =>
        val cand = pool.map(_._1).filterNot(selected.contains)
        val scored = cand.map { id =>
          val ms = if (selected.isEmpty) 0L
                   else selected.map(s => sims((id, s))).max
          (-(rel(id) - ms), id, ms)
        }.sortBy(t => (t._1, t._2))
        val (negScore, id, ms) = scored.head
        selected :+= id
        (qid, r.toLong, id, rel(id), ms, -negScore)
      }
    }

  test("q176 rows match a driver-side greedy MMR rerun") {
    val got = SimilarityOps.mmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSeq
    assert(got == rerun(loadVecs()))
    got.foreach { case (_, _, _, rel, ms, sc) => assert(sc == rel - ms) }
  }

  test("MMR lowers within-set redundancy vs the plain relevance top-10") {
    val vecs = loadVecs()
    val rows = rerun(vecs)
    val deltas = (0L until NQ.toLong).map { qid =>
      val (pool, sims) = poolFor(vecs, qid)
      def meanSim(ids: Seq[Long]): Double = {
        val ps = for (a <- ids; b <- ids if a != b) yield sims((a, b))
        ps.sum.toDouble / ps.size / 1e6
      }
      val mmr = rows.filter(_._1 == qid).sortBy(_._2).map(_._3)
      val plain = pool.take(Top).map(_._1)
      assert(mmr.head == plain.head, s"qid $qid: pick 1 != relevance argmax")
      (meanSim(plain), meanSim(mmr))
    }
    val (mp, mm) = (deltas.map(_._1).sum / NQ, deltas.map(_._2).sum / NQ)
    info(f"mean within-set pairwise sim: plain top-$Top $mp%.3f -> MMR $mm%.3f")
    assert(mm < mp, "MMR did not reduce within-set similarity")
  }
}
