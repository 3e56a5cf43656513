package graft

import org.scalatest.funsuite.AnyFunSuite
import PipelineRecompute._

/** q214 end-to-end composite properties:
  *  1. GATE LIVENESS: every gate genuinely fires on the fixture — at
  *     least one document is dropped (or downweighted) by each of
  *     quality, lang-ID, PII quarantine, near-dup downweighting,
  *     benchmark holdout and contamination (the r12 verdict's ask:
  *     a composite whose gates never fire proves nothing).
  *  2. CONSERVATION: per source, ingested = quality-dropped +
  *     lang-dropped + pii-quarantined + bench-excluded +
  *     contam-dropped + final (downweighting is not a drop).
  *  3. FULL INDEPENDENT RECOMPUTE ([[PipelineRecompute]]): the whole
  *     chain re-derived driver-side in plain Scala (own tokenizer,
  *     own md5/minhash, own regex redaction, own pack fold — no Spark
  *     expressions), asserting every output column per source. This
  *     pins the COMPOSITION semantics (weights survive the mix, the
  *     pack respects every quarantine, contamination scans original
  *     text) against an implementation that shares nothing with the
  *     lane.
  */
class PipelineCompositeSpec extends AnyFunSuite with SparkTestBase {

  test("q214: liveness, conservation, and a full independent recompute") {
    val got = ops.PipelineOps.pipelineComposite(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10),
         r.getDouble(11), r.getLong(12), r.getLong(13), r.getLong(14)))
      .toMap

    // ---- 1. gate liveness ----
    def tot(i: Int): Long = got.values.map(_.productElement(i).asInstanceOf[Long]).sum
    assert(tot(1) > 0, "quality gate never fired")
    assert(tot(2) > 0, "lang-ID gate never fired")
    assert(tot(3) > 0, "PII quarantine never fired")
    assert(tot(4) > 0, "near-dup downweighting never fired")
    assert(tot(5) > 0, "benchmark holdout never fired")
    assert(tot(6) > 0, "contamination gate never fired")

    // ---- 2. conservation ----
    got.foreach { case (src, t) =>
      assert(t._1 == t._2 + t._3 + t._4 + t._6 + t._7 + t._8,
        s"$src: drops + final != ingested: $t")
    }

    // ---- 3. full independent recompute ----
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val ch = chain(docs)
    val srcs = docs.map(_._2).distinct.sorted
    val finBySrc = ch.fin.groupBy(_._2)
    val wqBySrc = srcs.map { s =>
      val fs = finBySrc.getOrElse(s, Array.empty)
      val eff = fs.map { case (id, _, _, rt) => toks(rt).length.toLong * ch.w(id) }.sum
      s -> math.floor(math.sqrt(eff.toDouble / 1000000.0) * 1000000.0).toLong
    }.toMap
    val wqTot = wqBySrc.values.sum
    srcs.foreach { s =>
      val all = docs.filter(_._2 == s)
      val q = all.filter { case (_, _, t) => score(toks(t)) < 0.35 }
      val l = all.filter { case (_, _, t) =>
        score(toks(t)) >= 0.35 && pred(toks(t)) == "und" }
      val p = all.filter { case (_, _, t) =>
        score(toks(t)) >= 0.35 && pred(toks(t)) != "und" && nRed(t) >= 11 }
      val g3s = ch.g3k.filter(_._2 == s)
      val dw = g3s.count { case (id, _, _, _) => ch.w(id) < 1000000L }
      val be = g3s.count(_._1 < 20)
      val cd = g3s.count { case (id, _, _, _) => id >= 20 && ch.contam.contains(id) }
      val fs = finBySrc.getOrElse(s, Array.empty).sortBy(_._1)
      val eff = fs.map { case (id, _, _, rt) => toks(rt).length.toLong * ch.w(id) }.sum
      // greedy pack fold in doc_id order
      var running = 0L; var maxBin = -1L
      fs.foreach { case (_, _, _, rt) =>
        val n = toks(rt).length.toLong
        maxBin = math.max(maxBin, running / 4096L); running += n
      }
      val expect = (all.length.toLong, q.length.toLong, l.length.toLong,
        p.length.toLong, dw.toLong, be.toLong, cd.toLong, fs.length.toLong,
        fs.map(_._1).sum, eff,
        BigDecimal(wqBySrc(s).toDouble / wqTot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        math.floor(1000000000L.toDouble * wqBySrc(s) / wqTot).toLong,
        if (fs.isEmpty) 0L else maxBin + 1L,
        fs.map { case (_, _, _, rt) => toks(rt).length.toLong }.sum)
      assert(got(s) == expect, s"source $s: got ${got(s)}, recomputed $expect")
    }
  }
}
