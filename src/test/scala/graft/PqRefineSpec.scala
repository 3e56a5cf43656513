package graft

import org.scalatest.funsuite.AnyFunSuite

/** q160 Lloyd-refinement properties, verified three ways:
  *  1. the full 128-row audit matches an independent driver-side
  *     recomputation (same quantized-mean update, same Cauchy distance
  *     fold) — every count and floor-e6 error sum, exactly;
  *  2. Lloyd monotonicity: one update + re-assignment cannot increase
  *     total reconstruction error (up to the 1e-6 centroid quantization);
  *  3. the claim q155/q157 document — "codebook quality is the knob" —
  *     is MEASURED: ADC top-10 recall with the refined books is at least
  *     as good as with the seed books, and the improvement is reported.
  */
class PqRefineSpec extends AnyFunSuite with SparkTestBase {

  private val M = 8; private val Sub = 8; private val K = 16

  private def loadVecs(): Array[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)

  /** Cauchy-expansion subspace squared-L2, production fold order. */
  private def subDist(v: Array[Double], c: Array[Double], s: Int,
                      cFull: Boolean): Double = {
    var vv = 0.0; var vc = 0.0; var cc = 0.0
    for (j <- 0 until Sub) {
      val x = v(s * Sub + j); val y = if (cFull) c(s * Sub + j) else c(j)
      vv += x * x; vc += x * y; cc += y * y
    }
    vv - 2.0 * vc + cc
  }

  /** (vec, s) -> (code, dist) against full-width seed codebooks. */
  private def assignSeed(vecs: Array[(Long, Array[Double])],
                         cents: Array[(Long, Array[Double])])
      : Map[(Long, Int), (Long, Double)] =
    (for ((id, v) <- vecs; s <- 0 until M) yield {
      val (d, cid) = cents.map { case (cid, cv) => (subDist(v, cv, s, cFull = true), cid) }
        .minBy(identity)
      ((id, s), (cid, d))
    }).toMap

  /** Quantized-mean update: (s, code) -> 8-dim refined centroid. */
  private def refine(vecs: Array[(Long, Array[Double])],
                     asg: Map[(Long, Int), (Long, Double)])
      : Map[(Int, Long), Array[Double]] = {
    val members = asg.toSeq.groupBy { case ((_, s), (cid, _)) => (s, cid) }
    members.map { case ((s, cid), ms) =>
      val ids = ms.map(_._1._1)
      val cv = (0 until Sub).map { j =>
        val qsum = ids.map { id =>
          val x = vecs.find(_._1 == id).get._2(s * Sub + j)
          math.floor(x * 1e6).toLong
        }.sum
        (qsum.toDouble / 1e6) / ids.size
      }.toArray
      ((s, cid), cv)
    }
  }

  private def reassign(vecs: Array[(Long, Array[Double])],
                       books: Map[(Int, Long), Array[Double]])
      : Map[(Long, Int), (Long, Double)] =
    (for ((id, v) <- vecs; s <- 0 until M) yield {
      val (d, cid) = books.collect { case ((bs, cid), cv) if bs == s =>
        (subDist(v, cv, s, cFull = false), cid)
      }.minBy(identity)
      ((id, s), (cid, d))
    }).toMap

  test("q160 audit matches an independent Lloyd recomputation exactly") {
    val vecs = loadVecs()
    val cents = vecs.filter(_._1 < K)
    val asgOld = assignSeed(vecs, cents)
    val books = refine(vecs, asgOld)
    val asgNew = reassign(vecs, books)

    def stats(asg: Map[(Long, Int), (Long, Double)]): Map[(Long, Long), (Long, Long)] =
      asg.toSeq.groupBy { case ((_, s), (cid, _)) => (s.toLong, cid) }
        .map { case (k, ms) =>
          (k, (ms.size.toLong, ms.map(m => math.floor(m._2._2 * 1e6).toLong).sum))
        }
    val os = stats(asgOld); val ns = stats(asgNew)

    val rows = ops.SimilarityOps.pqRefine(spark, sf).collect()
    assert(rows.length == (os.keySet ++ ns.keySet).size)
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      val (nOld, errOld) = os.getOrElse(k, (0L, 0L))
      val (nNew, errNew) = ns.getOrElse(k, (0L, 0L))
      assert(r.getLong(2) == nOld, s"$k n_old")
      assert(r.getLong(3) == errOld, s"$k err_old_e6")
      assert(r.getLong(4) == nNew, s"$k n_new")
      assert(r.getLong(5) == errNew, s"$k err_new_e6")
    }
    // Lloyd monotonicity: total error cannot rise (1e-6 quantization slack
    // per element is dwarfed by the seed-book error)
    val totOld = rows.map(_.getLong(3)).sum
    val totNew = rows.map(_.getLong(5)).sum
    info(s"total err_old_e6=$totOld err_new_e6=$totNew " +
      f"(${100.0 * (totOld - totNew) / totOld}%.1f%% reduction)")
    assert(totNew < totOld, "refinement did not reduce reconstruction error")
    // conservation: every (vector, subspace) assigned exactly once, both sides
    assert(rows.map(_.getLong(2)).sum == vecs.length.toLong * M)
    assert(rows.map(_.getLong(4)).sum == vecs.length.toLong * M)
  }

  test("refined codebooks improve measured ADC top-10 recall") {
    val vecs = loadVecs()
    val cents = vecs.filter(_._1 < K)
    val asgOld = assignSeed(vecs, cents)
    val booksSeed: Map[(Int, Long), Array[Double]] =
      (for ((cid, cv) <- cents; s <- 0 until M)
        yield ((s, cid), cv.slice(s * Sub, s * Sub + Sub))).toMap
    val booksNew = refine(vecs, asgOld)
    val asgNew = reassign(vecs, booksNew)

    val queries = vecs.filter(_._1 < 5)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      for (i <- a.indices) { val d = a(i) - b(i); acc += d * d }
      acc
    }
    def recall(books: Map[(Int, Long), Array[Double]],
               asg: Map[(Long, Int), (Long, Double)]): Double = {
      val overlaps = queries.map { case (qid, qv) =>
        // 8x16 integer LUT for this query, then ADC = 8 lookups + sum
        val lut = books.map { case ((s, cid), cv) =>
          ((s, cid), math.floor(subDist(qv, cv, s, cFull = false) * 1e6).toLong)
        }
        val adc = vecs.filter(_._1 != qid).map { case (id, _) =>
          (id, (0 until M).map(s => lut((s, asg((id, s))._1))).sum)
        }
        val topAdc = adc.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
        val topTrue = vecs.filter(_._1 != qid)
          .map { case (id, v) => (id, l2(qv, v)) }
          .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
        (topAdc & topTrue).size
      }
      overlaps.sum.toDouble / (queries.length * 10.0)
    }
    val rSeed = recall(booksSeed, asgOld)
    val rNew = recall(booksNew, asgNew)
    info(f"ADC recall@10: seed books $rSeed%.2f -> refined books $rNew%.2f")
    assert(rNew >= rSeed,
      f"refinement degraded ADC recall: $rSeed%.2f -> $rNew%.2f")
    assert(rNew > 0.0)
  }
}
