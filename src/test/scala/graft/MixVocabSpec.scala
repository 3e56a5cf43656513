package graft

import org.scalatest.funsuite.AnyFunSuite

/** q139 mixture reweighting + q140 vocab induction: both lanes must
  * agree with driver-side recomputations from raw text, and q139 must
  * satisfy the temperature-sampling laws (flattening toward uniform,
  * budget conservation) that make it a real pretraining-mix primitive.
  */
class MixVocabSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs: Array[(String, Seq[String])] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ").toSeq)

  test("q139 matches a driver-side recomputation and the temperature laws hold") {
    val rows = ops.TextOps.mixReweight(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4), r.getLong(5), r.getDouble(6)))

    // driver-side recomputation: exact integer masses, quantized sqrt
    val mass = docs.groupBy(_._1).map { case (src, ds) =>
      (src, ds.length.toLong, ds.map(_._2.length.toLong).sum)
    }.toSeq.sortBy(_._1)
    val wq = mass.map { case (_, _, m) =>
      math.floor(math.sqrt(m.toDouble) * 1e6).toLong
    }
    val massTot = mass.map(_._3).sum
    val wqTot = wq.sum
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = mass.zip(wq).map { case ((src, n, m), w) =>
      val alloc = math.floor(1e9 * w / wqTot).toLong
      (src, n, m, r6(m.toDouble / massTot), r6(w.toDouble / wqTot),
       alloc, r6(alloc.toDouble / m))
    }
    assert(rows.toSeq == expected)

    // budget conservation: floor loss only, never over-allocation
    val allocSum = rows.map(_._6).sum
    assert(allocSum <= 1000000000L &&
           allocSum > 1000000000L - rows.length,
      s"allocation sum $allocSum outside the floor-loss band")

    // temperature flattening (alpha = 1/2): mass ordering is preserved
    // but every pairwise weight ratio is compressed toward 1
    val byMass = rows.sortBy(_._3)
    assert(byMass.map(_._5).toSeq == byMass.map(_._5).sorted.toSeq,
      "mix_weight must preserve the tok_mass ordering")
    for (Seq(lo, hi) <- byMass.toSeq.sliding(2) if lo._3 < hi._3) {
      val natRatio = hi._3.toDouble / lo._3
      val mixRatio = hi._5 / lo._5
      assert(mixRatio < natRatio + 1e-9,
        s"ratio not flattened: mix $mixRatio vs natural $natRatio")
    }
  }

  test("q141 matches a driver-side recomputation of the source-overlap matrix") {
    val rows = ops.TextOps.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getDouble(5)))

    // driver-side: per-source distinct 8-gram sets from raw text
    val sets: Map[String, Set[String]] = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.iterator.flatMap { case (_, toks) =>
        if (toks.length < 8) Iterator.empty
        else toks.sliding(8).map(_.mkString(" "))
      }.toSet
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val srcs = sets.keys.toSeq.sorted
    val expected = for {
      a <- srcs; b <- srcs if a < b
      shared = (sets(a) & sets(b)).size.toLong if shared > 0
    } yield (a, b, shared, sets(a).size.toLong, sets(b).size.toLong,
             r6(shared.toDouble / (sets(a).size + sets(b).size - shared)))
    assert(rows.toSeq == expected.sortBy(p => (p._1, p._2)))

    // audit laws: a < b canonical order, jaccard in (0, 1], counts consistent
    assert(rows.forall(p => p._1 < p._2))
    assert(rows.forall(p => p._6 > 0.0 && p._6 <= 1.0))
    assert(rows.forall(p => p._3 <= math.min(p._4, p._5)))
  }

  test("q140 matches a driver-side top-V recomputation with coverage shares") {
    val rows = ops.TextOps.vocabBuild(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4)))

    val tf = docs.iterator.flatMap(_._2).toSeq
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val tokTotal = tf.valuesIterator.sum
    val top = tf.toSeq.sortBy { case (t, c) => (-c, t) }.take(256)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var cum = 0L
    val expected = top.zipWithIndex.map { case ((t, c), i) =>
      cum += c
      (i + 1L, t, c, r6(c.toDouble / tokTotal), r6(cum.toDouble / tokTotal))
    }
    assert(rows.toSeq == expected)

    // vocab laws: contiguous ranks, non-increasing tf, monotone coverage
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sortBy(-_))
    assert(rows.map(_._5).toSeq == rows.map(_._5).toSeq.sorted)
    assert(rows.last._5 <= 1.0 + 1e-9)
  }
}
