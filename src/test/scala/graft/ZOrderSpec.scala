package graft

import org.scalatest.funsuite.AnyFunSuite

/** q161 Z-order layout properties:
  *  1. the full 128-row audit matches an independent driver-side Morton
  *     recomputation (grid ranks, bit interleave, bucket assignment,
  *     min/max envelopes) exactly;
  *  2. the data-skipping claim is MEASURED: fixed suppkey probe ranges
  *     touch at most half the buckets under z-order while the linear
  *     (partkey-sorted) layout prunes nothing on suppkey;
  *  3. partkey probes still skip under z-order (the trade is bounded,
  *     not one dimension sacrificed for the other).
  */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  private val Grid = 1024L
  private val Buckets = 64L

  private def morton(pb: Long, sb: Long): Long =
    (0 until 10).map { b =>
      (((pb >> b) & 1L) << (2 * b + 1)) + (((sb >> b) & 1L) << (2 * b))
    }.sum

  private case class Env(n: Long, pmin: Long, pmax: Long, smin: Long, smax: Long)

  private def recompute()
      : (Map[(String, Long), Env], (Long, Long), (Long, Long)) = {
    val rows = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pminv = rows.map(_._1).min; val pmaxv = rows.map(_._1).max
    val sminv = rows.map(_._2).min; val smaxv = rows.map(_._2).max
    val graded = rows.map { case (p, sk) =>
      val pb = ((p - pminv) * Grid) / (pmaxv - pminv + 1)
      val sb = ((sk - sminv) * Grid) / (smaxv - sminv + 1)
      (p, sk, pb, sb, morton(pb, sb))
    }
    def env(g: Map[Long, Array[(Long, Long)]], tag: String) =
      g.map { case (bkt, ms) =>
        ((tag, bkt), Env(ms.length.toLong, ms.map(_._1).min, ms.map(_._1).max,
                         ms.map(_._2).min, ms.map(_._2).max))
      }
    val z = env(graded.groupBy(_._5 / ((Grid * Grid) / Buckets))
      .map { case (k, v) => (k, v.map(t => (t._1, t._2))) }, "zorder")
    val l = env(graded.groupBy(_._3 / (Grid / Buckets))
      .map { case (k, v) => (k, v.map(t => (t._1, t._2))) }, "linear")
    (z ++ l, (pminv, pmaxv), (sminv, smaxv))
  }

  test("q161 audit matches a driver-side Morton recomputation exactly") {
    val (expected, _, _) = recompute()
    val rows = ops.AdvancedOps.zorderLayout(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val e = expected(k)
      assert(r.getLong(2) == e.n, s"$k n_rows")
      assert(r.getLong(3) == e.pmin && r.getLong(4) == e.pmax, s"$k p envelope")
      assert(r.getLong(5) == e.smin && r.getLong(6) == e.smax, s"$k s envelope")
    }
  }

  test("suppkey probes skip buckets under z-order, none under linear") {
    val (envs, (pminv, pmaxv), (sminv, smaxv)) = recompute()
    def touched(tag: String, lo: Long, hi: Long, dim: String): Int =
      envs.count { case ((t, _), e) =>
        t == tag && (if (dim == "s") e.smin <= hi && e.smax >= lo
                     else e.pmin <= hi && e.pmax >= lo)
      }
    // 8 disjoint probe ranges per dimension, each 1/8 of the domain
    def probes(lo: Long, hi: Long): Seq[(Long, Long)] = {
      val w = hi - lo + 1
      (0 until 8).map(i => (lo + w * i / 8, lo + w * (i + 1) / 8 - 1))
    }
    val sProbes = probes(sminv, smaxv)
    val pProbes = probes(pminv, pmaxv)
    val nZ = envs.keys.count(_._1 == "zorder")
    val nL = envs.keys.count(_._1 == "linear")

    val sZ = sProbes.map { case (lo, hi) => touched("zorder", lo, hi, "s") }
    val sL = sProbes.map { case (lo, hi) => touched("linear", lo, hi, "s") }
    info(s"suppkey probes touch (zorder): ${sZ.mkString(",")} of $nZ buckets")
    info(s"suppkey probes touch (linear): ${sL.mkString(",")} of $nL buckets")
    // linear layout cannot meaningfully prune on suppkey. Near-total
    // rather than total (r8 ADVICE: at very small sfs a sparse partkey
    // bucket can happen to miss a suppkey extreme, which is data
    // sparsity, not layout behavior): every probe touches >= 90% of
    // buckets, and on average the probes touch essentially all of them.
    assert(sL.forall(_ * 10 >= nL * 9),
      s"expected ~zero suppkey skipping under linear sort: ${sL.mkString(",")} vs $nL")
    assert(sL.sum.toDouble / sL.size >= nL * 0.95,
      s"linear layout pruned suppkey on average: ${sL.mkString(",")} vs $nL")
    // z-order prunes: each 1/8-domain probe touches at most half the buckets
    assert(sZ.forall(_ <= nZ / 2),
      s"z-order suppkey skipping too weak: ${sZ.mkString(",")} vs $nZ buckets")

    val pZ = pProbes.map { case (lo, hi) => touched("zorder", lo, hi, "p") }
    info(s"partkey probes touch (zorder): ${pZ.mkString(",")} of $nZ buckets")
    // the trade is bounded: partkey probes also touch at most half
    assert(pZ.forall(_ <= nZ / 2),
      s"z-order gave up partkey skipping: ${pZ.mkString(",")} vs $nZ buckets")
  }
}
