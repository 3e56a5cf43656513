package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded random inputs, SURVEY §5.3): algebraic
  * laws every engine must satisfy, checked over generated frames.
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {

  private def randomDf(seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val n = 50 + rnd.nextInt(200)
    (0 until n).map(i =>
      (i.toLong, s"cat_${rnd.nextInt(7)}", rnd.nextDouble() * 1000))
      .toDF("id", "category", "value")
  }

  test("sort is a permutation of its input") {
    for (seed <- 1 to 5) {
      val df = randomDf(seed)
      val in = df.collect().map(_.toSeq).sortBy(_.toString)
      val out = df.orderBy("value", "id").collect().map(_.toSeq).sortBy(_.toString)
      assert(in.sameElements(out))
    }
  }

  test("filter(p) ∪ filter(!p) partitions the input") {
    for (seed <- 1 to 5) {
      val df = randomDf(seed)
      val p = col("value") > 500
      val n = df.count()
      assert(df.filter(p).count() + df.filter(!p).count() == n)
      assert(df.filter(p).intersect(df.filter(!p)).count() == 0)
    }
  }

  test("groupBy count sums to total; mean bounded by min/max") {
    for (seed <- 1 to 5) {
      val df = randomDf(seed)
      val g = df.groupBy("category")
        .agg(count(lit(1)).as("n"), avg("value").as("m"),
             min("value").as("lo"), max("value").as("hi")).collect()
      assert(g.map(_.getLong(1)).sum == df.count())
      g.foreach(r => assert(r.getDouble(2) >= r.getDouble(3)
        && r.getDouble(2) <= r.getDouble(4)))
    }
  }

  test("limit(n).count <= n and is monotone") {
    val df = randomDf(42)
    assert(df.limit(10).count() <= 10)
    assert(df.limit(10000).count() == df.count())
  }

  test("topk == full sort prefix") {
    for (seed <- 1 to 3) {
      val df = randomDf(seed)
      val topk = df.orderBy(col("value").desc, col("id")).limit(7)
        .collect().map(_.getLong(0))
      val full = df.orderBy(col("value").desc, col("id"))
        .collect().take(7).map(_.getLong(0))
      assert(topk.sameElements(full))
    }
  }

  test("broadcast join == shuffle join (strategy-independence)") {
    val big = randomDf(7)
    val dim = {
      import spark.implicits._
      (0 until 7).map(i => (s"cat_$i", s"name_$i")).toDF("category", "cat_name")
    }
    val a = big.join(broadcast(dim), "category").collect().map(_.toSeq).sortBy(_.toString)
    val b = big.hint("shuffle_hash").join(dim, "category").collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
  }
}
