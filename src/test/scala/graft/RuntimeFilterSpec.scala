package graft

import org.scalatest.funsuite.AnyFunSuite

/** q123: Spark's runtime bloom-filter injection (InjectRuntimeFilter)
  * on the selective-dim ⋈ fact shape. Two claims:
  *  1. under the scoped thresholds the optimizer actually plants the
  *     filter — bloom_filter creation subquery on the dim side,
  *     might_contain on the fact side, BEFORE the join exchange;
  *  2. the rewrite is pure pruning — rows identical to the same join
  *     planned without it.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestBase {
  import ops.AdvancedOps

  test("optimizer injects might_contain on the fact side under scoped conf") {
    AdvancedOps.withRuntimeFilterConf(spark) {
      val df = AdvancedOps.runtimeFilterJoinLazy(spark, sf)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter in optimized plan:\n$optimized")
      // the filter must sit on the fact (lineitem) branch, upstream of
      // the join — i.e. the plan still contains the plain dim filter
      // AND a bloom probe over the fact's join key
      assert(optimized.contains("l_orderkey"),
        s"bloom probe not on the fact join key:\n$optimized")
    }
  }

  test("runtime-filtered result is row-identical to the plain join") {
    val plain = AdvancedOps.runtimeFilterJoinLazy(spark, sf)
      .collect().map(_.toSeq).toSeq
    val filtered = AdvancedOps.runtimeFilterJoin(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(plain.nonEmpty, "predicate selects no rows at this sf")
    assert(filtered == plain)
  }

  test("scoped conf restores prior session values") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.getOption(key)
    AdvancedOps.runtimeFilterJoin(spark, sf).count()
    assert(spark.conf.getOption(key) == before,
      "q123 leaked its conf scope into the session")
  }
}
