package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Eager-vs-lazy differential test, mirroring the reference's only
  * correctness check (main.rs:166-168 prints both paths for visual
  * comparison): the fused lazy pipeline and a per-stage-materialized
  * pipeline must agree exactly.
  */
class LazyEagerSpec extends AnyFunSuite with SparkTestBase {

  test("fused pipeline == per-stage materialized pipeline") {
    val lazyRes = ops.CoreOps.lazyPipeline(spark, sf).collect()

    // eager: force materialization between every stage (cache+count,
    // the Spark analogue of polars' per-op collect() in main.rs:85-138)
    val scan = Tables.lineitem(spark, sf).cache()
    scan.count()
    val sorted = scan.orderBy(col("l_extendedprice")).cache()
    sorted.count()
    val filtered = sorted.filter(col("l_extendedprice") > 500).cache()
    filtered.count()
    val eager = filtered
      .groupBy(col("l_returnflag"))
      .agg(graft.functions.Stable.dmean(col("l_orderkey")).as("id_mean"),
           graft.functions.Stable.dmean(col("l_extendedprice")).as("value_mean"))
      .orderBy("l_returnflag")
      .collect()
    Seq(scan, sorted, filtered).foreach(_.unpersist())

    assert(lazyRes.length == eager.length)
    lazyRes.zip(eager).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      // decimal-stabilized aggs ⇒ bit-exact across the two plans
      assert(a.getDouble(1) == b.getDouble(1))
      assert(a.getDouble(2) == b.getDouble(2))
    }
  }

  test("optimizer eliminates the dead pre-aggregation sort (O14)") {
    val plan = ops.CoreOps.lazyPipeline(spark, sf)
      .queryExecution.optimizedPlan.toString
    // the orderBy before filter/groupBy contributes nothing; Catalyst
    // must drop it (polars' describe_optimized_plan shows the same
    // rewrite), leaving only the final presentation Sort
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(sorts <= 1, s"dead sort survived:\n$plan")
  }
}
