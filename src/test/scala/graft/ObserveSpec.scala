package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability via Dataset.observe: accumulator-backed
  * metrics collected DURING the one pass the query already makes — the
  * production way to get row counts / quality tallies out of a 100 TB
  * job without a second scan (a separate .count() would re-read the
  * input).
  */
class ObserveSpec extends AnyFunSuite with SparkTestBase {

  test("observe() collects scan metrics in the same pass as the query") {
    val li = Tables.lineitem(spark, sf)
      .observe("scan_metrics",
        count(lit(1)).as("rows_scanned"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("high_discount"))
    val result = li.filter(col("l_quantity") > 30)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    var observed: Map[String, Any] = Map.empty
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        qe.observedMetrics.get("scan_metrics").foreach { row =>
          observed = row.getValuesMap(Seq("rows_scanned", "high_discount"))
        }
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      result.collect()
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(observed.nonEmpty, "observed metrics never arrived")
      // metrics reflect the PRE-filter scan — the full pass, not the
      // filtered result (proving the tally rode along, not re-derived)
      assert(observed("rows_scanned") == Tables.lineitem(spark, sf).count())
      val expectHigh = Tables.lineitem(spark, sf)
        .filter(col("l_discount") > 0.05).count()
      assert(observed("high_discount") == expectHigh)
    } finally spark.listenerManager.unregister(listener)
  }
}
