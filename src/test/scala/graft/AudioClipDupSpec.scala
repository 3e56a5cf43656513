package graft

import graft.ops.MultimodalOps.UlawCodec
import org.scalatest.funsuite.AnyFunSuite

/** q213 audio clip-dup, held two ways:
  *  1. every planted clipped pair must surface as ONE clean run —
  *     n_shared == longest_run == (n − clip − 7) 8-sample windows at
  *     exactly the planted (window-unaligned) clip offset;
  *  2. every OTHER reported pair must be GENUINE shared decoded
  *     content: the lane also finds "quantization twins" — µ-law
  *     buckets are ~2 048 PCM units wide at high amplitude, so two
  *     signals offset by a small constant decode IDENTICALLY for
  *     stretches. A driver-side recompute re-decodes both streams and
  *     confirms the windows really are equal (a detector this spec
  *     would catch: one reporting hash coincidences instead of
  *     content).
  */
class AudioClipDupSpec extends AnyFunSuite with SparkTestBase {

  private val Grain = 8

  private def pcmOf(id: Long, from: Int): Array[Int] =
    UlawCodec.decode(UlawCodec.encodeFrom(id, from, UlawCodec.sample2))._2

  test("every planted clipped pair surfaces as one clean run at the " +
       "planted window-unaligned offset") {
    val rows = Registry.all.find(_.name == "q213_audio_clipdup").get
      .build(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
                 (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    docIds.filter(_ % 3 == 0).foreach { id =>
      val clip = 7 + (id % 23)
      val expected = UlawCodec.nSamples(id) - clip - (Grain - 1)
      val got = rows.get((id * 2, id * 2 + 1))
      assert(got.contains((expected.toLong, expected.toLong, clip)),
        s"clip pair for doc $id: got $got, want one clean run of " +
          s"$expected at offset $clip")
      // the offset really is unaligned to the window for most docs
    }
    assert(docIds.exists(id => id % 3 == 0 && (7 + id % 23) % Grain != 0),
      "every planted offset was window-aligned — the fixture is too easy")
  }

  test("non-clip pairs are genuine quantization twins: reported windows " +
       "re-decode EQUAL driver-side") {
    val rows = Registry.all.find(_.name == "q213_audio_clipdup").get
      .build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    val others = rows.filter(r => !(r._2 == r._1 + 1 && r._1 % 2 == 0))
    assert(others.nonEmpty,
      "no quantization twins at this sf — the second assertion surface is empty")
    def decoded(vid: Long): Array[Int] = {
      val id = vid / 2
      pcmOf(id, if (vid % 2 == 0) 0 else 7 + (id % 23).toInt)
    }
    others.take(20).foreach { case (va, vb, nShared, run, diag) =>
      val a = decoded(va); val b = decoded(vb)
      // count genuinely equal windows at the reported diagonal and the
      // longest consecutive stretch — must be >= what the lane claims
      // for this diagonal (nShared spans ALL diagonals, run is this one)
      var longest = 0; var cur = 0
      var pa = math.max(0, diag.toInt)
      while (pa + Grain <= a.length && (pa - diag) + Grain <= b.length) {
        val eq = (0 until Grain).forall(j => a(pa + j) == b(pa - diag.toInt + j))
        if (eq) { cur += 1; longest = math.max(longest, cur) } else cur = 0
        pa += 1
      }
      assert(longest >= run,
        s"pair ($va,$vb) claims a run of $run at diag $diag but content " +
          s"supports only $longest — fingerprint matched non-equal audio")
    }
  }
}
