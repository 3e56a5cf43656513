package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-3 surface batteries (q82–q94) —
  * properties the DuckDB hash-compare can't express, like "lag really
  * is the previous row" or "every Z-order bucket is a tight 2-D box".
  */
class SurfaceOpsSpec extends AnyFunSuite with SparkTestBase {

  test("q88 lag/lead mirror adjacent rows within an order") {
    val rows = ops.SurfaceOps.windowBattery(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "prev_qty", "next_qty")
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, lines) =>
      val sorted = lines.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getDouble(3) == a.getDouble(2), "lag != previous quantity")
          assert(a.getDouble(4) == b.getDouble(2), "lead != next quantity")
        case _ => ()
      }
      // boundary rows have no neighbor
      assert(sorted.head.isNullAt(3) && sorted.last.isNullAt(4))
    }
  }

  test("q89 grouping sets: grand total row equals sum of per-flag rows") {
    val rows = ops.SurfaceOps.groupingSets(spark, sf).collect()
    val total = rows.filter(_.getLong(2) == 3L)
    assert(total.length == 1)
    val perFlag = rows.filter(_.getLong(2) == 1L).map(_.getLong(3)).sum
    assert(total.head.getLong(3) == perFlag, "per-flag counts don't sum to total")
  }

  test("q92 z-order buckets are tight bounding boxes in BOTH dimensions") {
    // bucket = top 6 of 16 z-bits = bits 7..5 of x AND y fixed → every
    // bucket confines both coordinates to one aligned 32-wide block.
    // This is the whole point of z-ordering: a lexicographic sort on
    // (x, y) would give y spans of the full 0..255 range instead.
    val rows = ops.SurfaceOps.zorderCluster(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 31, s"x span loose in bucket ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) <= 31, s"y span loose in bucket ${r.getLong(0)}")
    }
  }

  test("q93 stratified sample keeps roughly 10% of every stratum") {
    val sampled = ops.SurfaceOps.stratifiedSample(spark, sf)
      .select("c_mktsegment", "n_sample").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Tables.customer(spark, sf).groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sampled.foreach { case (seg, n) =>
      val frac = n.toDouble / full(seg)
      assert(frac > 0.01 && frac < 0.30, s"$seg sample fraction $frac out of band")
    }
  }

  test("q94 sliding 10/5 windows place every event in exactly two windows") {
    val total = ops.SurfaceOps.slidingWindows(spark, sf)
      .agg(sum("n")).head().getLong(0)
    val events = Tables.events(spark, sf).count()
    assert(total == 2 * events)
  }

  test("q86 cheapest-supplier argmin is planned through TopKPerKey") {
    val plan = ops.TpchOps.tpchQ2Min(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"rank-1 filter did not plan through the custom operator:\n$plan")
  }

  test("q86 reports the true per-part minimum cost") {
    val got = ops.TpchOps.tpchQ2Min(spark, sf)
      .select("p_key", "cost_q6").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.lineitem(spark, sf)
      .groupBy("l_partkey", "l_suppkey")
      .agg((floor(functions.Stable.dsum(col("l_extendedprice"))
        / functions.Stable.dsum(col("l_quantity")) * 1e6)).cast("long").as("c"))
      .groupBy("l_partkey").agg(min(col("c")).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (p, c) => assert(want(p) == c, s"part $p not minimal") }
  }

  test("q82 TPC-H Q7 broadcasts every dimension") {
    val plan = ops.TpchOps.tpchQ7(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 4,
      s"expected supplier/customer/nation×2 broadcast:\n$plan")
  }
}
