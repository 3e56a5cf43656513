package graft

import org.scalatest.funsuite.AnyFunSuite

class DedupClusterSpec extends AnyFunSuite with SparkTestBase {

  test("cluster labels are canonical minima and closed over the pair graph") {
    val pairs = ops.DedupOps.dedupMinhash(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = ops.DedupOps.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // every canonical id is smaller than its member and is itself
    // either unlabeled (it IS the cluster minimum) or absent
    clusters.foreach { case (doc, canon) =>
      assert(canon < doc)
      assert(!clusters.contains(canon), s"canonical $canon is not a root")
    }

    // closure: both endpoints of every near-dup pair resolve to the
    // same canonical id
    def root(x: Long): Long = clusters.getOrElse(x, x)
    pairs.foreach { case (a, b) =>
      assert(root(a) == root(b), s"pair ($a,$b) split across clusters")
    }

    // and the label is the true minimum of its cluster
    val members = clusters.groupBy(_._2).map { case (c, m) => c -> (m.keys.toSeq :+ c) }
    members.foreach { case (c, ms) => assert(ms.min == c) }
  }
}
