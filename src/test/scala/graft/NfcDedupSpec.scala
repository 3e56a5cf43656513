package graft

import org.scalatest.funsuite.AnyFunSuite
import java.text.Normalizer

/** q206: the NFC-equivalence grouping recomputed independently, plus
  * the claims that make the lane meaningful: multi-member groups are
  * invisible to byte-level grouping (every member a distinct raw
  * form), the renderings genuinely differ bytewise, and group sizes
  * vary (a corpus where every group is the same size tests nothing).
  */
class NfcDedupSpec extends AnyFunSuite with SparkTestBase {

  private val Composed = "\u00e9"
  private val Combining = "\u0301"

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private lazy val got: Seq[(String, Long, Long, Long)] =
    ops.DedupOps.nfcDedup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("q206 matches an independent driver-side NFC recompute") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): String =
      md.digest(sx.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val variants = docs.map { case (id, t) =>
      (id * 2, t.replace("e", Composed)) } ++
      docs.filter(_._1 % 3 != 0).map { case (id, t) =>
        (id * 2 + 1, t.replace("e", "e" + Combining)) }
    val want = variants
      .map { case (vid, vt) =>
        (vid, vt, Normalizer.normalize(vt, Normalizer.Form.NFC)) }
      .groupBy(v => h(v._3))
      .map { case (k, vs) =>
        (k, vs.size.toLong, vs.map(v => h(v._2)).distinct.size.toLong,
          vs.map(_._1).min) }
      .toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("byte-level dedup is blind to every multi-member group") {
    val multi = got.filter(_._2 >= 2)
    assert(multi.nonEmpty, "no multi-member NFC groups: the fixture is degenerate")
    multi.foreach { g =>
      assert(g._3 == g._2,
        s"group ${g._1}: raw forms ${g._3} < members ${g._2}: " +
          "some members are byte-identical, the NFC verb added nothing")
    }
  }

  test("group sizes vary and renderings differ bytewise yet NFC-equal") {
    assert(got.map(_._2).distinct.sorted == Seq(1L, 2L))
    val t = docs.find(_._1 % 3 != 0).get._2
    val a = t.replace("e", Composed)
    val b = t.replace("e", "e" + Combining)
    assert(a != b, "renderings byte-identical: the corpus has no 'e'?")
    assert(Normalizer.normalize(a, Normalizer.Form.NFC) ==
      Normalizer.normalize(b, Normalizer.Form.NFC))
  }
}
