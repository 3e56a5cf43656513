package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: both approximate variants must (a) score candidates
  * identically to the exact path and (b) retrieve a sane fraction of
  * the true neighbors — approximate in WHICH rows come back, never in
  * the numbers attached to them.
  */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  lazy val brute = asMap(ops.SimilarityOps.simTopK(spark, sf))

  test("IVF ANN: consistent scores + recall floor vs brute force") {
    val ivf = asMap(ops.SimilarityOps.simAnnIvf(spark, sf))
    assert(ivf.nonEmpty)
    ivf.foreach { case (k, v) =>
      brute.get(k).foreach(bv => assert(bv == v, s"score mismatch for $k"))
    }
    val recall = brute.keySet.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.1, s"IVF recall@10 collapsed: $recall")
  }

  test("LSH ANN: consistent scores vs brute force") {
    val lsh = asMap(ops.SimilarityOps.simAnnLsh(spark, sf))
    lsh.foreach { case (k, v) =>
      brute.get(k).foreach(bv => assert(bv == v, s"score mismatch for $k"))
    }
  }

  test("SemDeDup audit + kept lane match a driver-side brute-force recomputation") {
    val rows = ops.SimilarityOps.semDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val keptRows = ops.SimilarityOps.semDedupKept(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // independent recomputation: plain-Scala cosines over the raw table,
    // the SAME derived k / seeded + one-Lloyd-step clustering, the same
    // argmin assignment and round-half-up tau gate
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = embs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val k = math.max(16L, (embs.length + 63L) / 64L)
    def cellOf(cents: Seq[(Long, Array[Double], Double)])(id: Long, v: Array[Double]): Long =
      cents.map { case (cid, cv, cn) => (-dot(v, cv) / (nrm(id) * cn), cid) }.min._2
    // pass 1: seed centroids = first k vectors
    val seeds = embs.filter(_._1 < k).map { case (id, v) => (id, v, nrm(id)) }.toSeq
    val byCell1 = embs.groupBy { case (id, v) => cellOf(seeds)(id, v) }
    // Lloyd update: quantized-exact per-dim means
    val refined = byCell1.toSeq.map { case (cell, ms) =>
      val cv = (0 until ms.head._2.length).map { j =>
        (ms.map(m => math.floor(m._2(j) * 1e6).toLong).sum.toDouble / 1e6) / ms.length
      }.toArray
      (cell, cv, math.sqrt(dot(cv, cv)))
    }
    // pass 2: assign against refined centroids
    val byCell = embs.groupBy { case (id, v) => cellOf(refined)(id, v) }
    def cos6(a: (Long, Array[Double]), b: (Long, Array[Double])): Double =
      BigDecimal(dot(a._2, b._2) / (nrm(a._1) * nrm(b._1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    assert(rows.keySet == byCell.keySet)
    val allDropped = scala.collection.mutable.Set[Long]()
    byCell.foreach { case (cell, members) =>
      val ms = members.sortBy(_._1)
      val pairs = for {
        i <- ms.indices; j <- (i + 1) until ms.length
      } yield (ms(i), ms(j))
      val dropped = pairs.filter(p => cos6(p._1, p._2) >= 0.40).map(_._2._1).distinct
      allDropped ++= dropped
      val (nVecs, nPairs, nDropped, nKept) = rows(cell)
      assert(nVecs == ms.length.toLong, s"cell $cell n_vecs")
      assert(nPairs == pairs.length.toLong, s"cell $cell n_pairs")
      assert(nDropped == dropped.length.toLong, s"cell $cell n_dropped")
      assert(nKept == nVecs - nDropped, s"cell $cell kept+dropped")
    }
    // the corpus has planted near-dups, and clustering must localize
    // some of them — an all-zero drop column would mean the threshold
    // or the assignment is broken
    assert(rows.values.map(_._3).sum > 0, "no within-cell near-dups found")
    assert(rows.values.map(_._1).sum == embs.length.toLong)

    // q134 kept lane: exactly the corpus minus the dropped set, with
    // each survivor labeled by its (pass-2) cell
    val expectedKept = embs.filter(e => !allDropped.contains(e._1))
      .map { case (id, v) => (id, byCell.find(_._2.exists(_._1 == id)).get._1) }
      .sortBy(_._1)
    assert(keptRows.toSeq == expectedKept.toSeq)
    assert(keptRows.length + allDropped.size == embs.length)
  }
}
