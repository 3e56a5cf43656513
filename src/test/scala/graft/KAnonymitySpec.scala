package graft

import org.scalatest.funsuite.AnyFunSuite

/** q203's generalization ladder recomputed from scratch on the driver,
  * plus the liveness checks that keep the ladder honest: every rung
  * (finest release, two generalizations, suppression) must actually
  * fire on the registered fixture, and released+suppressed must
  * account for every document exactly once.
  */
class KAnonymitySpec extends AnyFunSuite with SparkTestBase {

  private val K = 5

  private lazy val docs: Seq[(String, String, Long, Long)] =
    Tables.documents(spark, sf).selectExpr(
        "lang", "source", "n_chars div 100", "n_chars div 500").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq

  private lazy val expected: Seq[(Long, String, String, Long, Long)] = {
    val g0 = docs.groupBy(d => (d._1, d._2, d._3)).map { case (k, m) => k -> m.size }
    val rel0 = g0.filter(_._2 >= K)
    val rem0 = docs.filterNot(d => rel0.contains((d._1, d._2, d._3)))
    val g1 = rem0.groupBy(d => (d._1, d._2, d._4)).map { case (k, m) => k -> m.size }
    val rel1 = g1.filter(_._2 >= K)
    val rem1 = rem0.filterNot(d => rel1.contains((d._1, d._2, d._4)))
    val g2 = rem1.groupBy(d => (d._1, d._4)).map { case (k, m) => k -> m.size }
    val rows =
      rel0.toSeq.map { case ((l, s, b), n) => (0L, l, s, b, n.toLong) } ++
      rel1.toSeq.map { case ((l, s, b), n) => (1L, l, s, b, n.toLong) } ++
      g2.filter(_._2 >= K).toSeq.map { case ((l, b), n) => (2L, l, "*", b, n.toLong) } ++
      g2.filter(_._2 < K).toSeq.map { case ((l, b), n) => (3L, l, "*", b, n.toLong) }
    rows.sortBy(r => (r._1, r._2, r._3, r._4))
  }

  private lazy val got: Seq[(Long, String, String, Long, Long)] =
    ops.TextOps.kAnonymity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
                 r.getLong(4))).toSeq

  test("q203 output matches the independent driver-side ladder recompute") {
    assert(got == expected)
  }

  test("every rung of the ladder fires on the registered fixture") {
    (0L to 3L).foreach { lvl =>
      assert(got.exists(_._1 == lvl),
        s"ladder level $lvl never fires — dead code at this scale; retune buckets")
    }
  }

  test("released + suppressed account for every document exactly once") {
    assert(got.map(_._5).sum == docs.length.toLong)
    // and every released group honors k
    got.filter(_._1 <= 2L).foreach(r =>
      assert(r._5 >= K, s"level ${r._1} group under k: $r"))
    got.filter(_._1 == 3L).foreach(r =>
      assert(r._5 < K, s"suppressed group at or over k: $r"))
  }
}
