package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite with SparkTestBase {

  test("custom operator == window row_number formulation (lineitem)") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val custom = TopKPerKey.topKPerKey(li,
        Seq(col("l_orderkey")),
        Seq(col("l_extendedprice").desc, col("l_linenumber").asc), 3)
      .collect().map(_.toSeq).map(_.toString).sorted
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).map(_.toString).sorted
    assert(custom.length == windowed.length)
    assert(custom.sameElements(windowed))
  }

  test("random data, several k values, with duplicate order values") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (0 until 5000)
      .map(i => (rnd.nextInt(40).toLong, i, rnd.nextInt(20).toDouble))
      .toDF("key", "id", "v")
    for (k <- Seq(1, 4, 17)) {
      val custom = TopKPerKey.topKPerKey(df, Seq(col("key")),
          Seq(col("v").desc, col("id").asc), k)
        .collect().map(_.toSeq).map(_.toString).sorted
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(_.toSeq).map(_.toString).sorted
      assert(custom.sameElements(windowed), s"k=$k mismatch")
    }
  }

  test("plan contains TopKPerKeyExec and exactly one exchange, no sort below it") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val df = TopKPerKey.topKPerKey(li, Seq(col("l_orderkey")),
      Seq(col("l_extendedprice").desc), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), s"plan:\n$plan") // Exec suffix stripped in render
    val at = plan.indexOf("TopKPerKey ")
    val below = plan.substring(at)
    assert(!below.contains("Sort "), s"unexpected sort below operator:\n$plan")
    assert(below.contains("Exchange hashpartitioning"),
      s"expected the clustering shuffle below the operator:\n$plan")
  }

  test("auto variant: high-cardinality flag plans the spillable window, same rows") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val keys = Seq(col("l_orderkey"))
    val ord = Seq(col("l_extendedprice").desc, col("l_linenumber").asc)
    val heap = TopKPerKey.topKPerKeyAuto(li, keys, ord, 2,
      highCardinalityKeys = false)
    val win = TopKPerKey.topKPerKeyAuto(li, keys, ord, 2,
      highCardinalityKeys = true)
    // same rows either way...
    assert(heap.collect().map(_.toSeq.toString).sorted.toSeq ==
           win.collect().map(_.toSeq.toString).sorted.toSeq)
    // ...but different physical strategies: bounded heap vs Spark's
    // spill-capable WindowExec (the 100 TB answer when per-partition
    // distinct keys × k no longer fits on the heap)
    assert(heap.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val winPlan = win.queryExecution.executedPlan.toString
    assert(!winPlan.contains("TopKPerKeyExec") && winPlan.contains("Window"),
      s"expected the window fallback:\n$winPlan")
  }

  test("keys with fewer than k rows keep all their rows") {
    import spark.implicits._
    val df = Seq((1L, 1, 1.0), (1L, 2, 2.0), (2L, 3, 3.0))
      .toDF("key", "id", "v")
    val r = TopKPerKey.topKPerKey(df, Seq(col("key")),
      Seq(col("v").desc, col("id").asc), 5).collect()
    assert(r.length == 3)
  }
}
