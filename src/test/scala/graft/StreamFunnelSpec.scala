package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q204 held to the streaming battery's standard: the stream must equal
  * the batch twin row-for-row, and the statefulness must be REAL — the
  * state machine has to advance across micro-batch boundaries, not
  * complete inside one batch.
  */
class StreamFunnelSpec extends AnyFunSuite with SparkTestBase {

  test("stream == batch funnel, row for row") {
    val stream = streaming.StreamingOps.streamFunnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val batch = ops.EventOps.funnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(stream == batch)
  }

  test("the state machine genuinely advances across micro-batches") {
    streaming.StreamingOps.streamFunnel(spark, sf).collect()
    val hex = java.lang.Integer.toHexString(sf.hashCode)
    // Update-mode memory sink: one progress row per (user, batch) —
    // a user whose DISTINCT progress rows differ advanced across
    // batch boundaries
    val emissions = spark.table(s"graft_funnel_$hex")
      .groupBy("user_id")
      .agg(countDistinct(struct(col("t1"), col("t2"), col("t3"))).as("n_states"),
           count(lit(1)).as("n_emits"))
      .collect()
    assert(emissions.exists(_.getLong(2) >= 2L),
      "every user appeared in only one batch — the slicing never spans a user")
    assert(emissions.exists(_.getLong(1) >= 2L),
      "no user's state ever advanced across a batch boundary — the funnel " +
        "completed within single batches; the staged slices are degenerate")
  }

  test("progress is set-once monotone across emissions (the max-reduction's premise)") {
    streaming.StreamingOps.streamFunnel(spark, sf).collect()
    val hex = java.lang.Integer.toHexString(sf.hashCode)
    val perUser = spark.table(s"graft_funnel_$hex")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
    perUser.values.foreach { rows =>
      // all non-(-1) values of each field agree: set once, never changed
      Seq[((Long, Long, Long)) => Long](_._1, _._2, _._3).foreach { f =>
        val set = rows.map(r => f(r._2)).filter(_ >= 0).distinct
        assert(set.size <= 1, s"a progress field changed after being set: $rows")
      }
    }
  }
}
