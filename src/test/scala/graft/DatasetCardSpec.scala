package graft

import org.scalatest.funsuite.AnyFunSuite

/** q181 differential: every card stat recomputed driver-side from the
  * raw documents — volume, exact-dup counts, language mode with the
  * (count desc, lang asc) tie-break, the discrete lower median, and
  * the integer-millionth shares.
  */
class DatasetCardSpec extends AnyFunSuite with SparkTestBase {

  test("q181 card rows match a driver-side recompute") {
    val rows = Tables.documents(spark, sf)
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val nDocs = ds.length.toLong
      val nUniq = ds.map(_._4).distinct.length.toLong
      val nTok = ds.map(_._4.split(" ", -1).length.toLong).sum
      val nChars = ds.map(_._3).sum
      val langs = ds.groupBy(_._2).map { case (l, xs) => (l, xs.length.toLong) }
      val (topLang, topCnt) = langs.toSeq.sortBy { case (l, c) => (-c, l) }.head
      val sorted = ds.map(_._3).sorted
      val p50 = sorted(((nDocs + 1) / 2 - 1).toInt)
      (src, nDocs, nDocs - nUniq, (nDocs - nUniq) * 1000000L / nDocs,
       nTok, nChars, langs.size.toLong, topLang, topCnt * 1000000L / nDocs,
       p50, nTok * 1000000L / nDocs)
    }
    val got = ops.TextOps.datasetCard(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7),
                 r.getLong(8), r.getLong(9), r.getLong(10))).toSeq
    assert(got == want)
    // shares are consistent and the card covers every source
    got.foreach { c =>
      assert(c._4 <= 1000000L && c._9 <= 1000000L)
      assert(c._2 > 0 && c._7 >= 1)
    }
    assert(got.map(_._1).distinct.size == got.size)
  }
}
