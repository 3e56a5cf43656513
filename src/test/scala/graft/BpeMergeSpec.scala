package graft

import org.scalatest.funsuite.AnyFunSuite

/** q167 differential: the engine's merge table (sentinel-wrapped
  * strings, native replace() application) must equal a direct
  * textbook BPE implementation over symbol lists — same word-frequency
  * table, all-adjacent-positions pair counting, (count DESC, pair ASC)
  * argmax, greedy leftmost non-overlapping merge application. This is
  * the proof that the string-replace trick IS BPE: both paths run the
  * SAME corpus-scaled merge budget (bpeRoundsFor — r14: the fixed 8
  * became a ladder) and every (step, lhs, rhs, merged, pair_count)
  * row must match, so a single divergent application anywhere
  * cascades into a visible count mismatch downstream.
  */
class BpeMergeSpec extends AnyFunSuite with SparkTestBase {

  /** Greedy leftmost non-overlapping application of merge (a, b). */
  private def applyMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** (merge table, trained word -> symbol count) by direct BPE, at
    * the engine's own corpus-scaled budget.
    */
  private def directBpe(words: Seq[(String, Long)])
      : (Seq[(Long, String, String, String, Long)], Map[String, Long]) = {
    val rounds = ops.TextOps.bpeRoundsFor(words.map(_._2).sum)
    var vocab: Seq[(String, List[String], Long)] =
      words.map { case (w, c) => (w, w.toList.map(_.toString), c) }
    val merges = (1 to rounds).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (_, syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      // argmax with the engine's tie-break: n DESC, then "lhs rhs" ASC
      val ((lhs, rhs), n) = counts.toSeq
        .minBy { case ((a, b), n) => (-n, a + " " + b) }
      vocab = vocab.map { case (w, syms, c) => (w, applyMerge(syms, lhs, rhs), c) }
      (k.toLong, lhs, rhs, lhs + rhs, n)
    }
    (merges, vocab.map { case (w, syms, _) => (w, syms.length.toLong) }.toMap)
  }

  test("q167 merge table equals a direct symbol-list BPE at the scaled budget") {
    val words = Tables.documents(spark, sf)
      .selectExpr("explode(split(text, ' ')) AS w").collect()
      .map(_.getString(0)).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val (want, _) = directBpe(words)
    // the ladder is LIVE at this sf: above the old fixed 8, so the
    // scaled rounds do real work here (floor-width runs would not
    // regression-test the ladder at all)
    assert(want.length > 8,
      s"merge budget not scaled at this corpus size: ${want.length}")
    val got = ops.TextOps.bpeMerges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                 r.getString(3), r.getLong(4))).toSeq
    info(s"merges: ${got.map(m => s"${m._4}(${m._5})").mkString(" ")}")
    assert(got == want, "engine merge table != direct BPE")
    // the loop actually composes: at least one later merge consumes an
    // earlier merge's output symbol (multi-char lhs/rhs)
    assert(got.exists(m => m._2.length > 1 || m._3.length > 1),
      "no merge built on a previous merge — loop may not be feeding back")
  }

  test("q168 per-doc token counts equal encoding with the direct-BPE vocab") {
    val docRows = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val words = docRows.flatMap(_._2.split(" ")).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val (_, nSym) = directBpe(words)
    val want = docRows.map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      (id, ws.length.toLong,
       ws.map(w => nSym.getOrElse(w, w.length.toLong)).sum,
       ws.map(_.length.toLong).sum)
    }.sortBy(_._1).toSeq
    val got = ops.TextOps.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "engine encoding != direct-BPE encoding")
    // training must actually compress: fewer tokens than characters
    val (toks, chars) = (got.map(_._3).sum, got.map(_._4).sum)
    info(f"corpus: $chars chars -> $toks BPE tokens (${toks.toDouble / chars}%.2f)")
    assert(toks < chars, "BPE encoding did not compress vs characters")
  }

  test("degenerate corpus: the loop emits the rounds that exist, no hard failure (r10)") {
    // r9 ADVICE: the Spark loop used to require() when the pair supply
    // exhausted while the SQL twin silently emitted a short merge
    // table — both engines now degrade identically. An empty corpus
    // slice is the extreme case: zero merges, empty vocab, no throw.
    import org.apache.spark.sql.functions.lit
    val (merges, vocab, handle) =
      ops.TextOps.bpeTrainCore(spark, sf, lit(false))
    try {
      assert(merges.isEmpty)
      assert(vocab.count() == 0L)
    } finally handle.unpersist(false)
  }
}
