package graft

import org.scalatest.funsuite.AnyFunSuite
import PipelineRecompute._

/** q215 incremental-composite properties:
  *  1. BUCKET LIVENESS: the admission buckets that define the lane
  *     genuinely fire — quality drops, dup-vs-base rejections (both
  *     the exact re-submissions and the 'delta '-prefixed near-dup
  *     variants must be caught by the base index), and admissions.
  *  2. CONSERVATION: per source, n_delta = quality + lang + pii +
  *     contam + dup_vs_base + dup_within + admitted (buckets are
  *     disjoint in pipeline order).
  *  3. FULL INDEPENDENT RECOMPUTE ([[PipelineRecompute]]): base chain
  *     + delta chain + admission re-derived driver-side in plain
  *     Scala, every output column asserted per source.
  *  4. ADMISSION SEMANTICS: an exact re-submission of a base-FINAL doc
  *     is always rejected as dup-vs-base (est_j = 1 against its own
  *     signature); a re-submission of a doc the gates dropped from the
  *     base is NOT rejected by the index (its content is not in the
  *     corpus) — the incremental check honors the curated state, not
  *     the raw corpus.
  */
class PipelineIncrementSpec extends AnyFunSuite with SparkTestBase {

  test("q215: liveness, conservation, recompute, and admission semantics") {
    val got = ops.PipelineOps.pipelineIncrement(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10)))
      .toMap

    def tot(i: Int): Long = got.values.map(_.productElement(i).asInstanceOf[Long]).sum
    // ---- 1. liveness of the defining buckets ----
    assert(tot(1) > 0, "quality gate never fired on the delta")
    assert(tot(5) > 0, "dup-vs-base never fired — the index caught nothing")
    assert(tot(6) > 0, "dup-within never fired — the twin branch is dead")
    assert(tot(7) > 0, "nothing admitted — inert increment")

    // ---- 2. conservation ----
    got.foreach { case (src, t) =>
      assert(t._1 == t._2 + t._3 + t._4 + t._5 + t._6 + t._7 + t._8,
        s"$src: buckets != n_delta: $t")
    }

    // ---- 3. full independent recompute ----
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val base = chain(docs)
    val bSig = sigsOf(base.fin.map { case (id, _, _, rt) => (id, rt) }.toSeq)
    def revTxt(t: String): String = toks(t).reverse.mkString(" ")
    val delta: Array[(Long, String, String)] =
      docs.filter(_._1 % 5 == 0)
        .map { case (id, s, t) => (id + 1000000L, s, "delta " + t) } ++
      docs.filter(_._1 % 7 == 3)
        .map { case (id, s, t) => (id + 2000000L, s, t) } ++
      docs.filter(_._1 % 11 == 1)
        .map { case (id, s, t) => (id + 3000000L, s, revTxt(t)) } ++
      docs.filter(_._1 % 11 == 1)
        .map { case (id, s, t) => (id + 4000000L, s, revTxt(t)) }
    val dg1k = delta.filter { case (_, _, t) => score(toks(t)) >= 0.35 }
    val dg2k = dg1k.filter { case (_, _, t) => pred(toks(t)) != "und" }
    val dg3k = dg2k.filter { case (_, _, t) => nRed(t) < 11 }
      .map { case (id, s, t) => (id, s, t, redact(t)) }
    val dContam = dg3k
      .filter { case (_, _, t, _) => grams(toks(t), 8).exists(base.benchGrams) }
      .map(_._1).toSet
    val dcln = dg3k.filterNot { case (id, _, _, _) => dContam.contains(id) }
    val dSig = sigsOf(dcln.map { case (id, _, _, rt) => (id, rt) }.toSeq)
    val dvb = bandedCross(dSig, bSig)
      .filter { case (a, b) => estJ(dSig(a), bSig(b)) >= 0.5 }
      .map(_._1)
    val dwd = bandedPairs(dSig)
      .filter { case (a, b) => estJ(dSig(a), dSig(b)) >= 0.5 }
      .map(_._2) // pairs are (smaller, larger): the LARGER id is rejected
      .filterNot(dvb.contains)
    val srcs = delta.map(_._2).distinct.sorted
    srcs.foreach { s =>
      val all = delta.filter(_._2 == s)
      val q = all.count { case (_, _, t) => score(toks(t)) < 0.35 }
      val l = all.count { case (_, _, t) =>
        score(toks(t)) >= 0.35 && pred(toks(t)) == "und" }
      val p = all.count { case (_, _, t) =>
        score(toks(t)) >= 0.35 && pred(toks(t)) != "und" && nRed(t) >= 11 }
      val g3s = dg3k.filter(_._2 == s)
      val c = g3s.count { case (id, _, _, _) => dContam.contains(id) }
      val vb = g3s.count { case (id, _, _, _) =>
        !dContam.contains(id) && dvb.contains(id) }
      val wd = g3s.count { case (id, _, _, _) =>
        !dContam.contains(id) && !dvb.contains(id) && dwd.contains(id) }
      val adm = g3s.filter { case (id, _, _, _) =>
        !dContam.contains(id) && !dvb.contains(id) && !dwd.contains(id) }
      val expect = (all.length.toLong, q.toLong, l.toLong, p.toLong, c.toLong,
        vb.toLong, wd.toLong, adm.length.toLong, adm.map(_._1).sum,
        adm.map { case (_, _, _, rt) => toks(rt).length.toLong }.sum)
      assert(got(s) == expect, s"source $s: got ${got(s)}, recomputed $expect")
    }

    // ---- 4. admission semantics on the exact re-submissions ----
    val finIds = base.fin.map(_._1).toSet
    val copies = dcln.filter(_._1 >= 2000000L)
    val resubOfFinal = copies.filter { case (id, _, _, _) =>
      finIds.contains(id - 2000000L) }
    assert(resubOfFinal.nonEmpty, "no clean re-submission of a final doc")
    resubOfFinal.foreach { case (id, _, _, rt) =>
      if (toks(rt).length >= 3)
        assert(dvb.contains(id),
          s"exact re-submission $id of a base-final doc was not rejected")
    }
    // a re-submission whose base original was dropped from the final
    // set (and which itself survives the delta gates clean) must NOT
    // be flagged dup-vs-base UNLESS it genuinely near-matches some
    // OTHER base-final doc — the index holds the CURATED state, so
    // the original's raw-corpus presence alone must not reject it.
    // The "other match" side is checked brute-force over ALL final
    // sigs (not just banded candidates), so a dvb flag that has no
    // full-scan support would fail loudly here (r13 ADVICE: this
    // semantic was described but never asserted).
    val resubOfDropped = copies.filter { case (id, _, _, _) =>
      !finIds.contains(id - 2000000L) }
    resubOfDropped.foreach { case (id, _, _, _) =>
      dSig.get(id).foreach { sig =>
        val matchesSomeFinal = bSig.exists { case (_, sb) => estJ(sig, sb) >= 0.5 }
        assert(!dvb.contains(id) || matchesSomeFinal,
          s"clean re-submission $id of a non-final base doc was rejected " +
            "dup-vs-base with no supporting near-match in the final set — " +
            "the index is leaking non-curated state")
      }
    }
    info(s"re-submissions: ${resubOfFinal.length} of final docs (all rejected), " +
      s"${resubOfDropped.length} of non-final docs (dvb only with full-scan support)")
  }
}
