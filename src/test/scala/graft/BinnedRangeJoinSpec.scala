package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BinnedRangeJoin rule: the naive BETWEEN join must plan as an
  * equi-join when the bin-width conf is set, with results identical to
  * the nested-loop plan — including negative-value domains (floor-div
  * binning) and both join orientations.
  */
class BinnedRangeJoinSpec extends AnyFunSuite with SparkTestBase {

  private val W = plans.BinnedRangeJoin.WidthConf

  private def withWidth[A](w: Long)(f: => A): A = {
    val prev = spark.conf.getOption(W)
    spark.conf.set(W, w.toString)
    try f finally prev match {
      case Some(v) => spark.conf.set(W, v)
      case None => spark.conf.unset(W)
    }
  }

  test("q97 plans as a hash equi-join, not a nested loop") {
    val plan = withWidth(ops.EventOps.RangeJoinWidthMicros) {
      ops.EventOps.rangeJoinAutoLazy(spark, sf)
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected equi join:\n$plan")
    assert(plan.toLowerCase.contains("explode"), s"expected bin explode:\n$plan")
  }

  test("q97 registry entry restores the session bin-width conf") {
    val prev = spark.conf.getOption(W)
    try {
      spark.conf.unset(W)
      ops.EventOps.rangeJoinAuto(spark, sf).collect()
      assert(spark.conf.getOption(W).isEmpty,
        "rangeJoinAuto leaked the bin-width conf into the session")
    } finally prev.foreach(spark.conf.set(W, _))
  }

  test("inverted interval (hi < lo) yields no match, not a Sequence crash") {
    import spark.implicits._
    val pts = (0L to 20L).toDF("p")
    val iv = Seq((5L, 10L), (15L, 3L)).toDF("lo", "hi") // second is inverted
    withWidth(4L) {
      val rows = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("p").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == (5L to 10L).toSeq, rows.mkString(","))
    }
  }

  test("without the conf the same query is a nested loop (rule is opt-in)") {
    val prev = spark.conf.getOption(W)
    spark.conf.unset(W)
    try {
      val wins = Tables.events(spark, sf)
        .select(date_trunc("hour", col("ts")).as("h")).distinct()
        .select(col("h"), (col("h") - expr("INTERVAL 30 MINUTES")).as("ws"),
                (col("h") + expr("INTERVAL 90 MINUTES")).as("we"))
      val plan = Tables.events(spark, sf)
        .join(wins, col("ts") >= col("ws") && col("ts") < col("we"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally prev.foreach(spark.conf.set(W, _))
  }

  test("binned results equal nested-loop results on a negative long domain") {
    import spark.implicits._
    // points and intervals straddling zero: floor-div binning must not
    // split bins differently on the negative side
    val pts = (-50L to 50L by 3).toDF("p")
    val iv = Seq((-40L, -25L), (-10L, 12L), (0L, 7L), (30L, 49L), (-3L, 3L))
      .toDF("lo", "hi")
    def run(): Array[(Long, Long, Long)] =
      pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("p", "lo", "hi").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity)
    val naive = run()
    val binned = withWidth(8L)(run())
    assert(binned.sameElements(naive), "binned join changed the result set")
    assert(naive.nonEmpty)
  }

  test("rewrite fires with the interval side on the left too") {
    import spark.implicits._
    val pts = (0L to 100L).toDF("p")
    val iv = Seq((5L, 15L), (90L, 99L)).toDF("lo", "hi")
    withWidth(10L) {
      val df = iv.join(pts, col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(df.count() == 11 + 10)
    }
  }

  test("joins that already have an equi key are left alone") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val b = Seq((1L, 5L, 15L), (2L, 25L, 30L)).toDF("k2", "lo", "hi")
    withWidth(10L) {
      val df = a.join(b, col("k") === col("k2") &&
        col("v") >= col("lo") && col("v") <= col("hi"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_bin"), s"rule fired on an equi join:\n$plan")
      assert(df.count() == 1)
    }
  }

  test("timestamp intervals: empty sequence impossible, nulls drop out") {
    import spark.implicits._
    val pts = Seq(Some(100L), None).toDF("p")
    val iv = Seq((Some(90L), Some(110L)), (None, Some(50L))).toDF("lo", "hi")
    withWidth(16L) {
      val n = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi")).count()
      assert(n == 1, "null point/bound must not match")
    }
  }
}
