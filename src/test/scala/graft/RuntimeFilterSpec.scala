package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning: Spark 4 can inject a bloom filter
  * built from the selective (filtered) side of a join into the probe
  * side's scan, so fact rows that cannot match are dropped at the scan
  * instead of surviving to the shuffle — at 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * matching fraction. Thresholds are tuned down because the testdata is
  * tiny; production defaults (10 MB creation side) fire on real dims.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestBase {

  test("bloom filter from selective dim side injected into fact scan") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join so the filter matters
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
      // and the filtered plan still returns correct results
      val viaFilter = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaFilter == plain, s"bloom-filtered results diverge: $viaFilter vs $plain")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
