package graft

import org.scalatest.funsuite.AnyFunSuite

/** q201/q202 recomputed from scratch on the driver over the raw event
  * rows — the sequential-min funnel chain and the epoch-week cohort
  * matrix are easy to get subtly wrong (co-occurrence instead of
  * strict ordering; calendar weeks instead of epoch-anchored), so the
  * recompute is the independent statement of the intended semantics.
  */
class FunnelRetentionSpec extends AnyFunSuite with SparkTestBase {

  private lazy val events: Seq[(Long, String, Long)] =
    Tables.events(spark, sf).selectExpr("user_id", "event_type",
        "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("q201 matches a driver-side sequential-min recompute") {
    val byUser = events.groupBy(_._1)
    val t1 = byUser.flatMap { case (u, es) =>
      val vs = es.filter(_._2 == "view").map(_._3)
      if (vs.isEmpty) None else Some(u -> vs.min)
    }
    val t2 = t1.flatMap { case (u, v) =>
      val cs = byUser(u).filter(e => e._2 == "click" && e._3 > v).map(_._3)
      if (cs.isEmpty) None else Some(u -> (v, cs.min))
    }
    val t3 = t2.flatMap { case (u, (v, c)) =>
      val ps = byUser(u).filter(e => e._2 == "purchase" && e._3 > c).map(_._3)
      if (ps.isEmpty) None else Some(u -> (v, ps.min))
    }
    val want = Seq(
      (1L, "view", t1.size.toLong, 0L),
      (2L, "click", t2.size.toLong, t2.values.map { case (v, c) => c - v }.sum),
      (3L, "purchase", t3.size.toLong, t3.values.map { case (v, p) => p - v }.sum))
    val got = ops.EventOps.funnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // the funnel is strictly narrowing and non-trivial on this fixture
    assert(want(0)._3 >= want(1)._3 && want(1)._3 >= want(2)._3)
    assert(want(2)._3 > 0, "no user completes the funnel — fixture too small")
  }

  test("q202 matches a driver-side epoch-week cohort recompute") {
    val week = 7L * 86400L * 1000000L
    val uw = events.map(e => (e._1, e._3 / week)).distinct
    val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val cells = uw.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, m) => k -> m.size.toLong }
    val want = cells.toSeq.sortBy(_._1).map { case ((cw, off), n) =>
      val size = cells((cw, 0L))
      (cw, off, n, size, n * 1000000L / size)
    }
    val got = ops.EventOps.retention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSeq
    assert(got == want)
    // offset-0 cells are full retention by construction
    got.filter(_._2 == 0L).foreach(c => assert(c._5 == 1000000L))
    assert(got.exists(_._2 > 0L), "single-week fixture: no retention signal")
  }
}
