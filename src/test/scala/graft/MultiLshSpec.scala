package graft

import org.scalatest.funsuite.AnyFunSuite

/** q164 multi-table LSH properties against a driver-side recomputation:
  * every reported candidate really collides with the query in at least
  * one of the 4 tables (soundness), every colliding corpus vector at
  * cosine rank ≤ 10 among collisions is reported (completeness of the
  * ranked cut), and the any-table candidate set is a superset of each
  * single table's.
  */
class MultiLshSpec extends AnyFunSuite with SparkTestBase {

  // geometry derived from the lane's own constants (r8 ADVICE: a
  // hard-coded 4x5 here would silently test a stale configuration if
  // the lane's shape ever changes)
  private val T = ops.SimilarityOps.MtTables
  private val P = ops.SimilarityOps.MtPlanes
  private val NQ = ops.SimilarityOps.NQueries
  private val K = ops.SimilarityOps.TopK

  test("q164 candidates are exactly the any-table collisions, ranked by cosine") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def bucket(v: Array[Double], t: Int): Long =
      (0 until P).map { p =>
        val w = ops.SimilarityOps.mtPlaneInt(t)(p).map(_ / 1000.0)
        var acc = 0.0
        for (j <- v.indices) acc += v(j) * w(j)
        if (acc > 0) 1L << p else 0L
      }.sum
    val buckets: Map[Long, IndexedSeq[Long]] =
      vecs.map { case (id, v) => (id, (0 until T).map(t => bucket(v, t))) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      for (i <- a.indices) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i) }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val vmap = vecs.toMap
    val got = ops.SimilarityOps.simAnnMultiLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .groupBy(_._1)

    (0L until NQ.toLong).foreach { qid =>
      val collide = vecs.collect {
        case (id, _) if id != qid &&
          (0 until T).exists(t => buckets(id)(t) == buckets(qid)(t)) => id
      }
      // single-table candidate sets are subsets of the any-table set
      (0 until T).foreach { t =>
        val single = vecs.collect {
          case (id, _) if id != qid && buckets(id)(t) == buckets(qid)(t) => id
        }
        assert(single.toSet.subsetOf(collide.toSet))
      }
      val expectTop = collide
        .map(id => (id, math.rint(cos(vmap(qid), vmap(id)) * 1e6) / 1e6))
        .sortBy { case (id, c) => (-c, id) }.take(K).map(_._1)
      val gotIds = got.getOrElse(qid, Array.empty).sortBy(_._3).map(_._2).toSeq
      assert(gotIds == expectTop.toSeq, s"q$qid ranked candidates")
    }
  }
}
