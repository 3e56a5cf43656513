package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-2 queries whose VALUE is the
  * plan: results prove semantics, these prove the physical strategy
  * survives refactors (the properties that matter at 100 TB).
  */
class PlanShapeSpec extends AnyFunSuite with SparkTestBase {

  private def physical(name: String): String = {
    val q = Registry.all.find(_.name == name).get
    q.build(spark, sf).queryExecution.executedPlan.toString
  }

  test("q66 binned range join: equi-join, never a nested-loop join") {
    val plan = physical("q66_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to a nested loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast equi-join:\n$plan")
  }

  test("q69 TPC-H Q5: dims broadcast, single fact-fact exchange pre-agg") {
    val plan = physical("q69_tpch_q5")
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 4, s"expected >=4 broadcast dim joins, got $bhj:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // lineitem⋈orders may shuffle (large sf) or broadcast (tiny sf —
    // orders fits under the auto-broadcast threshold here); what must
    // NEVER happen is more than one shuffle join or a nested loop
    val smjOrShuffled = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(smjOrShuffled <= 1, s"more than one shuffle join:\n$plan")
    assert(bhj + smjOrShuffled == 5, s"expected 5 joins total:\n$plan")
  }

  test("q77 SQL-text rank filter planned through the custom operator") {
    val plan = physical("q77_sql_topk")
    assert(plan.contains("TopKPerKey"),
      s"TopKRankPushdown did not fire on SQL text:\n$plan")
  }

  test("q60/q78 ORC and CSV scans keep filter pushdown") {
    val orc = physical("q60_orc_roundtrip")
    assert(orc.contains("PushedFilters: [") &&
      orc.contains("GreaterThan(l_quantity,30"),
      s"ORC scan lost the pushed filter:\n$orc")
  }

  test("q64 k-means: no shuffle before the partial aggregate (map-side argmin)") {
    val plan = physical("q64_kmeans_iter")
    // the plan below the first HashAggregate must be shuffle-free:
    // scan → repartition-by-id exchange is allowed (input staging), but
    // no join/exchange may sit between the generate and the partial agg
    val lines = plan.linesIterator.toVector
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    assert(aggIdx >= 0)
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
  }
}
