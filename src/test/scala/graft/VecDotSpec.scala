package graft

import graft.expressions.VecDot
import graft.functions.VectorFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential test: the native codegen VecDot must be bit-identical
  * to the higher-order-function fold it replaces (same left-to-right
  * double accumulation), on float and double arrays — this is what
  * makes swapping it into oracle-checked paths safe.
  */
class VecDotSpec extends AnyFunSuite with SparkTestBase {

  private def randomVecs(seed: Int, n: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong,
        Array.fill(dim)(rnd.nextFloat() * 2 - 1),
        Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("VecDot == zip_with/aggregate fold on float arrays, bit-exact") {
    val df = randomVecs(1, 200, 64)
    val r = df.select(
      VecDot.vecDot(col("a"), col("b")).as("native"),
      VectorFns.dotFold(
        VectorFns.toDouble(col("a")), VectorFns.toDouble(col("b"))).as("fold"))
      .collect()
    r.foreach(x => assert(
      java.lang.Double.doubleToLongBits(x.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(x.getDouble(1))))
  }

  test("VecDot on double arrays and mixed float/double") {
    val df = randomVecs(2, 50, 16)
      .withColumn("ad", VectorFns.toDouble(col("a")))
    val r = df.select(
      VecDot.vecDot(col("ad"), col("b")).as("mixed"),
      VecDot.vecDot(col("a"), col("b")).as("ff")).collect()
    r.foreach(x => assert(x.getDouble(0) == x.getDouble(1)))
  }

  test("ragged arrays yield null (matches dotFold's null propagation)") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d))").head()
    assert(r.isNullAt(0))
    // and through codegen on a real scan
    val df = Tables.embeddings(spark, sf)
      .select(VecDot.vecDot(col("embedding"),
        slice(col("embedding"), 1, 10)).as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("null array yields null") {
    val r = spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))")
      .head()
    assert(r.isNullAt(0))
  }

  test("registered for SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head().getDouble(0)
    assert(r == 11.0)
  }

  test("participates in whole-stage codegen (no fallback)") {
    // a LocalTableScan is precomputed without codegen — use a real scan
    val df = Tables.embeddings(spark, sf)
      .select(VecDot.vecDot(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vec_dot("), s"plan was:\n$plan")
    // and evaluates without codegen errors
    assert(df.collect().forall(_.getDouble(0) >= 0))
  }

  test("self dot is the squared norm (ANN base invariant)") {
    val df = randomVecs(4, 30, 64)
    val r = df.select(sqrt(VecDot.vecDot(col("a"), col("a"))).as("n")).collect()
    r.foreach(x => assert(x.getDouble(0) >= 0))
  }
}
