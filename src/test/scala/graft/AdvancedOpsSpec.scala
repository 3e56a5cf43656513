package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AdvancedOpsSpec extends AnyFunSuite with SparkTestBase {
  import ops.AdvancedOps

  test("sketches: envelope booleans true; raw HLL within 2% rsd, p50 near exact") {
    val r = AdvancedOps.sketches(spark, sf).head()
    assert(r.getBoolean(0), "HLL estimate outside its ±4·rsd envelope")
    assert(r.getBoolean(1), "approx p50 outside the histogram [p49, p51] rank band")
    assert(r.getLong(2) == Tables.lineitem(spark, sf).count())
    // and the numeric property behind the booleans, independently
    val li = Tables.lineitem(spark, sf)
    val hll = li.agg(approx_count_distinct(col("l_orderkey"), 0.02)).head().getLong(0)
    val exact = li.agg(count_distinct(col("l_orderkey"))).head().getLong(0)
    assert(math.abs(hll - exact).toDouble / exact < 0.05, s"hll=$hll exact=$exact")
    val p50 = li.agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    val exactP50 = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    assert(math.abs(p50 - exactP50) / exactP50 < 0.01)
  }

  test("bucketed join plan has no shuffle exchange on either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = AdvancedOps.bucketedJoin(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      // everything BELOW the join must be exchange-free (the
      // aggregation above it still shuffles on its own key, fine);
      // AQE wraps the tree, so assert on the rendered plan text
      val joinAt = plan.indexOf("SortMergeJoin")
      assert(joinAt >= 0, s"no SortMergeJoin in:\n$plan")
      val below = plan.substring(joinAt)
      assert(!below.contains("Exchange"),
        s"bucketing failed to kill the join shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partition-pruned scan touches only the selected date") {
    val df = AdvancedOps.partitionPrune(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"),
      s"no partition filter in:\n$scan")
    // and agrees with the unpartitioned computation
    val direct = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === lit("2024-01-15"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == direct)
  }

  test("asof join picks the latest at-or-before order (literal case)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // miniature replica of the operator on controlled data
    val ev = Seq((1L, "2024-01-05 10:00:00", 100L), (1L, "2024-01-01 00:00:00", 101L))
      .toDF("user_id", "ts_s", "event_id")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("event_id"),
              lit(1).as("kind"), lit(null).cast("long").as("o_orderkey"))
    val ord = Seq((1L, "2024-01-02 00:00:00", 7L), (1L, "2024-01-04 00:00:00", 9L),
                  (1L, "2024-01-06 00:00:00", 11L))
      .toDF("user_id", "ts_s", "o_orderkey")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
              lit(null).cast("long").as("event_id"), lit(0).as("kind"), col("o_orderkey"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("kind").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = ev.unionByName(ord)
      .withColumn("lo", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select("event_id", "lo").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(100L -> 9L, 101L -> -1L))
  }

  test("pivot equals manual conditional aggregation") {
    val p = AdvancedOps.pivotAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val manual = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(avg(when(col("l_linestatus") === "F", col("l_quantity"))).as("f"),
           avg(when(col("l_linestatus") === "O", col("l_quantity"))).as("o"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    p.foreach { case (k, (f, o)) =>
      val (mf, mo) = manual(k)
      assert(math.abs(f - mf) < 1e-9 && math.abs(o - mo) < 1e-9)
    }
  }

  test("q98 histogram quantiles land within one bucket width of exact") {
    val est = AdvancedOps.quantileHist(spark, sf).collect()
      .map(r => r.getDouble(0) -> r.getLong(2) / 1e6).toMap
    val Array(lo, hi) = Tables.lineitem(spark, sf)
      .agg(min("l_extendedprice"), max("l_extendedprice")).head()
      .toSeq.map(_.asInstanceOf[Double]).toArray
    val width = (hi - lo) / 1024.0
    val exact = Tables.lineitem(spark, sf)
      .stat.approxQuantile("l_extendedprice", est.keys.toArray.sorted, 0.0)
    est.keys.toSeq.sorted.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) <= width,
        s"q=$q est=${est(q)} exact=$ex width=$width")
    }
  }

  test("q120 linear-counting estimate lands near exact distinct counts") {
    val rows = AdvancedOps.linearCount(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (rf, zeroBits, exact) =>
      assert(zeroBits > 0, s"$rf: bitmap saturated — enlarge it")
      // the float estimate lives here, not in the oracle: ln across
      // engines can differ in the last ulp
      val m = AdvancedOps.LcBits.toDouble
      val est = -m * math.log(zeroBits / m)
      val err = math.abs(est - exact) / math.max(exact, 1L)
      assert(err < 0.15, s"$rf: est $est vs exact $exact (err $err)")
    }
  }

  test("q99 count-min never underestimates; absent keys stay near zero") {
    val rows = AdvancedOps.countMin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (tok, est, exact) =>
      assert(est >= exact, s"$tok: CMS underestimated ($est < $exact)")
    }
    // 4 x 1024 counters vs a small vocabulary: collisions should cost
    // at most a handful of counts at sf0.001
    val (_, absentEst, absentExact) = rows.find(_._1 == "zz_absent").get
    assert(absentExact == 0 && absentEst < 100,
      s"absent-key estimate $absentEst suspiciously large")
  }
}
