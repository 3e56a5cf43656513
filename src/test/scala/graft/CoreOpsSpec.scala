package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the core parity operators (SURVEY §2) on tiny literal
  * DataFrames plus the testdata fixtures.
  */
class CoreOpsSpec extends AnyFunSuite with SparkTestBase {
  import ops.CoreOps

  test("sortAsc orders by price with unique tiebreaks") {
    val r = CoreOps.sortAsc(spark, sf).collect()
    val prices = r.map(_.getDouble(2))
    assert(prices.sameElements(prices.sorted))
    assert(r.length == 6000)
  }

  test("filterGt keeps only rows above threshold") {
    val r = CoreOps.filterGt(spark, sf).collect()
    assert(r.nonEmpty && r.forall(_.getDouble(2) > 45))
  }

  test("limitPrefix returns exactly 100 ordered rows") {
    val r = CoreOps.limitPrefix(spark, sf).collect()
    assert(r.length == 100)
    val keys = r.map(x => (x.getLong(0), x.getInt(1)))
    assert(keys.sameElements(keys.sorted))
  }

  test("groupMean: mean * count == decimal-exact sum") {
    val r = CoreOps.groupMean(spark, sf).collect()
    import graft.functions.Stable
    val sums = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(Stable.dsum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> (x.getDouble(2), x.getLong(3)))
      .toMap
    r.foreach { x =>
      val (s, n) = sums((x.getString(0), x.getString(1)))
      assert(math.abs(x.getDouble(2) * n - s) < 1e-6)
      assert(x.getLong(4) == n)
    }
  }

  test("groupFirst is the row with minimal (orderkey, linenumber) per flag") {
    val r = CoreOps.groupFirst(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_orderkey", "l_linenumber").collect()
      .groupBy(_.getString(0))
    r.foreach { x =>
      val expMin = li(x.getString(0)).map(y => (y.getLong(1), y.getInt(2))).min
      assert((x.getLong(1), x.getInt(2)) == expMin)
    }
  }

  test("toMatrix: numeric cells populated, non-numeric are null") {
    val r = CoreOps.toMatrix(spark, sf).limit(5).collect()
    r.foreach { x =>
      val vec = x.getSeq[Any](2)
      assert(vec.length == 11)
      assert(vec.take(8).forall(_ != null)) // 8 numeric lineitem cols
      assert(vec.drop(8).forall(_ == null)) // flag/status/shipdate
    }
  }

  test("datagen matches FIXTURES A2 canonical distribution") {
    // filter(value1 > 110) keeps ~31% of rows; 10 categories; value2 mean ~500
    val n = 100000L
    val df = spark.range(n).select(
      col("id"),
      concat(lit("cat_"), (rand(42) * 10).cast("int")).as("category"),
      (randn(43) * 20 + 100).as("value1"),
      (rand(44) * 1000).as("value2"))
    val kept = df.filter(col("value1") > 110).count().toDouble / n
    assert(kept > 0.27 && kept < 0.35, s"filter fraction $kept")
    val groups = df.groupBy("category").agg(avg("value2").as("m")).collect()
    assert(groups.length == 10)
    groups.foreach(g => assert(math.abs(g.getDouble(1) - 500) < 30))
  }

  test("set ops satisfy |union| == |A| + |B| - |intersect| and except disjointness") {
    val m = CoreOps.setOps(spark, sf).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val a = Tables.lineitem(spark, sf).filter(col("l_quantity") > 45)
      .select("l_orderkey").distinct().count()
    val b = Tables.lineitem(spark, sf).filter(col("l_discount") > 0.08)
      .select("l_orderkey").distinct().count()
    assert(m("union") == a + b - m("intersect"))
    assert(m("except") == a - m("intersect"))
  }

  test("filter and projection reach the parquet scan") {
    val plan = CoreOps.scanAgg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_returnflag:string>"),
      s"schema not pruned:\n$plan")
  }

  test("stats variance matches Spark's var_samp within fp tolerance") {
    val r = ops.CoreOps.stats(spark, sf).collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    val expected = Tables.lineitem(spark, sf)
      .agg(var_samp(col("l_quantity")), var_samp(col("l_extendedprice"))).head()
    assert(math.abs(r("l_quantity") - expected.getDouble(0)) / expected.getDouble(0) < 1e-9)
    assert(math.abs(r("l_extendedprice") - expected.getDouble(1)) / expected.getDouble(1) < 1e-9)
  }
}
