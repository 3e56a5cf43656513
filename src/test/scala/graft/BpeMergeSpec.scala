package graft

import org.scalatest.funsuite.AnyFunSuite

/** q167 differential: the engine's merge table (sentinel-wrapped
  * strings, native replace() application) must equal a direct
  * textbook BPE implementation over symbol lists — same word-frequency
  * table, all-adjacent-positions pair counting, (count DESC, pair ASC)
  * argmax, greedy leftmost non-overlapping merge application. This is
  * the proof that the string-replace trick IS BPE: both paths run 8
  * full rounds and every (step, lhs, rhs, merged, pair_count) row must
  * match, so a single divergent application anywhere cascades into a
  * visible count mismatch downstream.
  */
class BpeMergeSpec extends AnyFunSuite with SparkTestBase {

  private val Rounds = 8

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

  private def directBpe(words: Seq[(String, Long)])
      : Seq[(Long, String, String, String, Long)] = {
    var vocab: Seq[(List[String], Long)] =
      words.map { case (w, c) => (w.toList.map(_.toString), c) }
    (1 to Rounds).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      // argmax with the engine's tie-break: n DESC, then "lhs rhs" ASC
      val ((lhs, rhs), n) = counts.toSeq
        .minBy { case ((a, b), n) => (-n, a + " " + b) }
      vocab = vocab.map { case (syms, c) => (applyMerge(syms, lhs, rhs), c) }
      (k.toLong, lhs, rhs, lhs + rhs, n)
    }
  }

  test("q167 merge table equals a direct symbol-list BPE over 8 rounds") {
    val words = Tables.documents(spark, sf)
      .selectExpr("explode(split(text, ' ')) AS w").collect()
      .map(_.getString(0)).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val want = directBpe(words)
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
}
