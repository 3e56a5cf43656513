package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stream-static incremental dedup (q138): the streaming lane must
  * produce EXACTLY the batch q137 verdicts — same delta slice, same
  * banded-MinHash candidate rule, same best-match reduction — because
  * both share q137's DuckDB oracle. Also pins the stream-side
  * contract: the streaming stage is stateless (multi-band collisions
  * emit duplicate match rows into the sink) and the reader-side
  * row_number reduction must absorb that multiplicity.
  */
class StreamStaticDedupSpec extends AnyFunSuite with SparkTestBase {

  test("stream-static verdicts == batch incremental verdicts, row for row") {
    val stream = streaming.StreamingOps.streamStaticDedup(spark, sf).collect()
    val batch = ops.DedupOps.dedupIncremental(spark, sf).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getBoolean(1),
       if (r.isNullAt(2)) None else Some(r.getLong(2)),
       if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(stream.map(key).toSeq == batch.map(key).toSeq)
  }

  test("verdict reduction absorbs multi-band collision multiplicity") {
    // run once to populate the memory sink, then inspect the raw sink:
    // a pair colliding in several bands emits several identical match
    // rows; the final output must still verdict each delta doc once
    val out = streaming.StreamingOps.streamStaticDedup(spark, sf).collect()
    val qname = spark.sessionState.catalog.listTables("default")
      .map(_.table).find(_.startsWith("graft_ssd_"))
    assert(qname.isDefined, "memory sink table registered")
    val sink = spark.table(qname.get).collect()
    val pairs = sink.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length >= pairs.distinct.length)
    assert(out.map(_.getLong(0)).distinct.length == out.length,
      "each delta doc verdicted exactly once despite sink multiplicity")
    // dups must point into the corpus partition, never at the delta
    out.filter(!_.getBoolean(1)).foreach { r =>
      assert(r.getLong(2) % 5 != 4, "dup_of must be a corpus doc")
    }
  }
}
