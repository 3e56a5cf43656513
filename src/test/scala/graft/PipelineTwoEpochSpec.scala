package graft

import org.scalatest.funsuite.AnyFunSuite
import PipelineRecompute._

/** q219 two-epoch properties:
  *  1. FULL INDEPENDENT RECOMPUTE: both epochs re-derived driver-side
  *     in plain Scala (own tokenizer/minhash/redaction via
  *     [[PipelineRecompute]]) — the epoch-2 card asserted per source,
  *     with the folded index modeled as base-final sigs ∪ epoch-1
  *     admitted sigs.
  *  2. FOLD LIVENESS, per doc: EVERY clean re-submission of an
  *     epoch-1-admitted doc that has a signature is rejected
  *     dup-vs-base against its own folded entry — the admission
  *     chain remembers what it admitted.
  *  3. CROSS-EPOCH CATCH: at least one reversed epoch-2 doc is
  *     rejected against a FOLDED epoch-1 reversed twin (content that
  *     entered the index only through the previous ingest).
  *  4. CONSERVATION per source.
  */
class PipelineTwoEpochSpec extends AnyFunSuite with SparkTestBase {

  test("q219: recompute, fold liveness, cross-epoch catch, conservation") {
    val got = ops.PipelineOps.pipelineTwoEpoch(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10)))
      .toMap

    // ---- 4. conservation ----
    got.foreach { case (src, t) =>
      assert(t._1 == t._2 + t._3 + t._4 + t._5 + t._6 + t._7 + t._8,
        s"$src: buckets != n_delta: $t")
    }

    // ---- 1. full recompute of both epochs ----
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val base = chain(docs)
    val bSig = sigsOf(base.fin.map { case (id, _, _, rt) => (id, rt) }.toSeq)
    def revTxt(t: String): String = toks(t).reverse.mkString(" ")
    // epoch 1 == q215's delta chain (mirrors PipelineIncrementSpec)
    val delta1: Array[(Long, String, String)] =
      docs.filter(_._1 % 5 == 0)
        .map { case (id, s, t) => (id + 1000000L, s, "delta " + t) } ++
      docs.filter(_._1 % 7 == 3)
        .map { case (id, s, t) => (id + 2000000L, s, t) } ++
      docs.filter(_._1 % 11 == 1)
        .map { case (id, s, t) => (id + 3000000L, s, revTxt(t)) } ++
      docs.filter(_._1 % 11 == 1)
        .map { case (id, s, t) => (id + 4000000L, s, revTxt(t)) }
    def gateChain(delta: Array[(Long, String, String)])
        : Array[(Long, String, String, String)] =
      delta.filter { case (_, _, t) => score(toks(t)) >= 0.35 }
        .filter { case (_, _, t) => pred(toks(t)) != "und" }
        .filter { case (_, _, t) => nRed(t) < 11 }
        .map { case (id, s, t) => (id, s, t, redact(t)) }
    def contamOf(g3: Array[(Long, String, String, String)]): Set[Long] =
      g3.filter { case (_, _, t, _) => grams(toks(t), 8).exists(base.benchGrams) }
        .map(_._1).toSet
    val dg3k1 = gateChain(delta1)
    val dcln1 = dg3k1.filterNot { case (id, _, _, _) => contamOf(dg3k1)(id) }
    val dSig1 = sigsOf(dcln1.map { case (id, _, _, rt) => (id, rt) }.toSeq)
    val dvb1 = bandedCross(dSig1, bSig)
      .filter { case (a, b) => estJ(dSig1(a), bSig(b)) >= 0.5 }.map(_._1)
    val dwd1 = bandedPairs(dSig1)
      .filter { case (a, b) => estJ(dSig1(a), dSig1(b)) >= 0.5 }
      .map(_._2).filterNot(dvb1.contains)
    val adm1 = dcln1.filter { case (id, _, _, _) =>
      !dvb1.contains(id) && !dwd1.contains(id) }
    assert(adm1.nonEmpty, "epoch 1 admitted nothing — inert fixture")
    // the folded index: base-final sigs ∪ epoch-1 admitted sigs
    val fSig = bSig ++ sigsOf(adm1.map { case (id, _, _, rt) => (id, rt) }.toSeq)
    // epoch 2 delta
    val delta2: Array[(Long, String, String)] =
      adm1.map { case (id, s, t, _) => (id + 20000000L, s, t) } ++
      docs.filter(_._1 % 7 == 3)
        .map { case (id, s, t) => (id + 30000000L, s, t) } ++
      docs.filter(_._1 % 13 == 7)
        .map { case (id, s, t) => (id + 40000000L, s, revTxt(t)) }
    val eg3k = gateChain(delta2)
    val eContam = contamOf(eg3k)
    val ecln = eg3k.filterNot { case (id, _, _, _) => eContam(id) }
    val eSig = sigsOf(ecln.map { case (id, _, _, rt) => (id, rt) }.toSeq)
    val edvbPairs = bandedCross(eSig, fSig)
      .filter { case (a, b) => estJ(eSig(a), fSig(b)) >= 0.5 }
    val edvb = edvbPairs.map(_._1)
    val edwd = bandedPairs(eSig)
      .filter { case (a, b) => estJ(eSig(a), eSig(b)) >= 0.5 }
      .map(_._2).filterNot(edvb.contains)
    val srcs = delta2.map(_._2).distinct.sorted
    srcs.foreach { s =>
      val all = delta2.filter(_._2 == s)
      val q = all.count { case (_, _, t) => score(toks(t)) < 0.35 }
      val l = all.count { case (_, _, t) =>
        score(toks(t)) >= 0.35 && pred(toks(t)) == "und" }
      val p = all.count { case (_, _, t) =>
        score(toks(t)) >= 0.35 && pred(toks(t)) != "und" && nRed(t) >= 11 }
      val g3s = eg3k.filter(_._2 == s)
      val c = g3s.count { case (id, _, _, _) => eContam(id) }
      val vb = g3s.count { case (id, _, _, _) =>
        !eContam(id) && edvb.contains(id) }
      val wd = g3s.count { case (id, _, _, _) =>
        !eContam(id) && !edvb.contains(id) && edwd.contains(id) }
      val adm = g3s.filter { case (id, _, _, _) =>
        !eContam(id) && !edvb.contains(id) && !edwd.contains(id) }
      val expect = (all.length.toLong, q.toLong, l.toLong, p.toLong, c.toLong,
        vb.toLong, wd.toLong, adm.length.toLong, adm.map(_._1).sum,
        adm.map { case (_, _, _, rt) => toks(rt).length.toLong }.sum)
      assert(got(s) == expect, s"source $s: got ${got(s)}, recomputed $expect")
    }

    // ---- 2. fold liveness per doc: clean branch-A re-submissions
    //      with a signature are ALL rejected dup-vs-base ----
    val branchA = ecln.filter(_._1 >= 20000000L).filter(_._1 < 30000000L)
    val aWithSig = branchA.filter { case (id, _, _, _) => eSig.contains(id) }
    assert(aWithSig.nonEmpty, "no signed branch-A re-submission — fold untested")
    aWithSig.foreach { case (id, _, _, _) =>
      assert(edvb.contains(id),
        s"re-submission $id of an epoch-1-admitted doc was NOT rejected — " +
          "the folded index forgot what it admitted")
    }

    // ---- 3. cross-epoch catch: a reversed branch-C doc rejected
    //      against a FOLDED entry (epoch-1 id range), not a base doc ----
    val crossCatch = edvbPairs.filter { case (a, b) =>
      a >= 40000000L && b >= 1000000L }
    assert(crossCatch.nonEmpty,
      "no reversed epoch-2 doc matched a folded epoch-1 entry — " +
        "the cross-epoch branch is dead on this fixture")
  }
}
