package graft

import graft.plans.{TopKPerKey, TopKPerKeyExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rank-pushdown optimizer rule: `row_number() <= k` over a window
  * must plan through the bounded-heap TopKPerKey operator — with
  * unchanged results — and must NOT fire where restricting rows would
  * change window-function values.
  */
class TopKRankPushdownSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def sample = Seq(
    ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 40.0),
    ("b", 5, 5.0), ("b", 6, 15.0), ("b", 7, 25.0),
    ("c", 8, 1.0)
  ).toDF("k", "id", "v")

  test("row_number<=k filter plans through TopKPerKeyExec with identical results") {
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val q = sample.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)

    assert(q.queryExecution.optimizedPlan.collect { case t: TopKPerKey => t }.nonEmpty,
      s"rule did not fire:\n${q.queryExecution.optimizedPlan}")
    // executedPlan may be wrapped in AdaptiveSparkPlanExec (opaque to
    // collect) — assert on the rendered tree instead
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), s"no TopKPerKey exec in:\n$physical")
    // the operator must not cost an extra shuffle: one exchange total
    assert(physical.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"redundant exchange above TopKPerKey in:\n$physical")

    val got = q.orderBy("k", "rn")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(3))).toSeq
    // expected top-2 per key by (v desc, id asc), computed independently
    val expected = Seq(
      ("a", 4, 1), ("a", 2, 2),
      ("b", 7, 1), ("b", 6, 2),
      ("c", 8, 1))
    assert(got == expected)
  }

  test("rn < k and rn = 1 bounds also fire; conjunct extraction works") {
    val w = Window.partitionBy($"k").orderBy($"v".asc)
    val lt = sample.withColumn("rn", row_number().over(w)).filter($"rn" < 3)
    val eq = sample.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"v" < 100.0)
    Seq(lt, eq).foreach { q =>
      assert(q.queryExecution.optimizedPlan.collect { case t: TopKPerKey => t }.nonEmpty,
        s"rule did not fire:\n${q.queryExecution.optimizedPlan}")
    }
    assert(lt.count() == 2 + 2 + 1)
    assert(eq.count() == 3)
  }

  test("does NOT fire for non-row_number windows or multi-expression windows") {
    val w = Window.partitionBy($"k").orderBy($"v".asc)
    // rank(): ties change semantics under row restriction — must not fire
    val r = sample.withColumn("rn", rank().over(w)).filter($"rn" <= 2)
    assert(r.queryExecution.optimizedPlan.collect { case t: TopKPerKey => t }.isEmpty)
    // row_number + sum over the same window: sum needs ALL rows — must not fire
    val s = sample
      .withColumn("rn", row_number().over(w))
      .withColumn("total", sum($"v").over(Window.partitionBy($"k")))
      .filter($"rn" <= 2)
    val sums = s.collect().map(r => (r.getString(0), r.getDouble(4))).toMap
    assert(sums("a") == 100.0, s"partition sum must cover pruned rows, got $sums")
    // global top-k (no partitionBy) stays on the window path
    val g = sample.withColumn("rn", row_number().over(Window.orderBy($"v".asc)))
      .filter($"rn" <= 2)
    assert(g.queryExecution.optimizedPlan.collect { case t: TopKPerKey => t }.isEmpty)
    assert(g.count() == 2)
  }
}
