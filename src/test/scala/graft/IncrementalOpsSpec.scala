package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalOpsSpec extends AnyFunSuite with SparkTestBase {

  test("q113 upsert: change set applies via broadcast joins, snapshot never sort-merges") {
    val plan = ops.IncrementalOps.upsert(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q113 upsert semantics: deletes gone, updates applied, inserts present") {
    val merged = ops.IncrementalOps.upsert(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // inserted status N: one row per key%100==0 at price 9999
    val nIns = Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(100)) === 0).count()
    assert(merged("N")._1 == nIns && merged("N")._2 == 9999L * nIns)
    // no deleted key contributes: recompute totals excluding %10==1
    val expectTotal = Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(10)) =!= 1).count() + nIns
    assert(merged.values.map(_._1).sum == expectTotal)
  }

  test("q114 incremental merge equals from-scratch recompute (Spark-side)") {
    val inc = ops.IncrementalOps.incrementalAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val Dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val full = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
           sum(col("l_extendedprice").cast(Dec)).cast("double").as("sum_price"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // bit-exact, not approximate: decimal partials merge associatively
    assert(inc.toSeq == full.toSeq)
  }

  test("q122 refresh stream: B sequential merge commits land exactly on " +
       "the closed-form recompute; sustained maintenance rate reported") {
    import ops.IncrementalOps._
    val t0 = System.nanoTime()
    val got = refreshStream(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val secs = (System.nanoTime() - t0) / 1e9
    // Spark-side closed-form recompute (the DuckDB oracle's twin):
    // originals surviving all B deletes + the B insert sets
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
              floor(col("o_totalprice") * 100).cast("long").as("price_c"))
    val survivors = base.filter(!pmod(col("o_orderkey"), lit(97))
      .between(1, RefreshBatches))
    val m = pmod(col("o_orderkey"), lit(101))
    val inserted = base.filter(m.between(1, RefreshBatches))
      .select((col("o_orderkey") + m * lit(10000000000L)).as("o_orderkey"),
              lit("N").as("o_orderstatus"),
              (col("price_c") + m.cast("long")).as("price_c"))
    val truth = survivors.unionByName(inserted)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"),
           sum(col("o_orderkey")).as("key_checksum"))
      .orderBy("o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == truth.toSeq)
    val snapRows = base.count()
    info(f"refresh maintenance: $RefreshBatches commits over $snapRows-row " +
      f"snapshot in $secs%.2fs = ${RefreshBatches * snapRows / secs}%.0f " +
      "maintained rows/sec")
  }
}
