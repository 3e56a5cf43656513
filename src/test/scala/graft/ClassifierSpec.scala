package graft

import org.scalatest.funsuite.AnyFunSuite

/** Classifier gate (q133): the hashed-BoW logit path must agree with a
  * driver-side recomputation — md5-derived 60-bit bucket hash, the
  * shipped weight vector, exact LONG summation, floor'd mean score —
  * mirroring Bm25Spec's differential for the scoring lane.
  */
class ClassifierSpec extends AnyFunSuite with SparkTestBase {

  test("logits match a driver-side recomputation of the hashed-BoW model") {
    val rows = ops.TextOps.classifierFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getBoolean(4)))

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val w = ops.TextOps.clfWeights
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def h60(tok: String): Long = {
      val hex = mdig.digest(tok.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expected = docs.map { case (id, toks) =>
      val logit = toks.map(t => w((h60(t) % 64L).toInt)).sum
      val score = math.floor(logit.toDouble * 1e6 / toks.length).toLong
      (id, toks.length.toLong, logit, score, score >= 0L)
    }.sortBy(_._1)
    assert(rows.toSeq == expected.toSeq)
    // the gate must actually separate: both classes present
    assert(rows.exists(_._5) && rows.exists(!_._5), "degenerate gate")
  }

  test("q142 adaptive gate matches a driver-side exact-percentile recomputation") {
    val rows = ops.TextOps.adaptiveGate(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4)))

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ").toSeq)
    val w = ops.TextOps.clfWeights
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def h60(tok: String): Long = {
      val hex = mdig.digest(tok.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def score(toks: Seq[String]): Long = {
      val logit = toks.map(t => w((h60(t) % 64L).toInt)).sum
      math.floor(logit.toDouble * 1e6 / toks.length).toLong
    }
    val expected = docs.groupBy(_._1).toSeq.map { case (src, ds) =>
      val scores = ds.map(d => score(d._2)).sorted
      val n = scores.length
      // thr = least score with cum-count >= ceil(0.25 n): sorted(k-1)
      val thr = scores(math.ceil(n * 0.25).toInt - 1)
      val kept = scores.count(_ >= thr).toLong
      (src, n.toLong, thr, kept,
       BigDecimal(kept.toDouble / n)
         .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    assert(rows.toSeq == expected)
    // gate laws: a p25 cutoff keeps >= 75% of every source, and at
    // least one source must actually drop documents
    assert(rows.forall(p => p._5 >= 0.75 && p._4 <= p._2))
    assert(rows.exists(p => p._4 < p._2), "gate dropped nothing anywhere")
  }
}
