package graft

import graft.ops.MultimodalOps.Y4mCodec
import org.scalatest.funsuite.AnyFunSuite

/** q211 video near-dup held to an INDEPENDENT closed-form referent:
  * the fixture recipe (trim frame 0 of every doc_id % 3 == 0 video
  * with >= 3 frames) fully determines the pair table — every trimmed
  * pair must surface with shared = run = nf-1 at diagonal 1, and
  * NOTHING else may pair (the luma formula separates docs, so any
  * extra pair means fingerprint collision or index leakage).
  */
class VideoNearDupSpec extends AnyFunSuite with SparkTestBase {

  test("pair table == the closed-form trimmed-clip referent, exactly") {
    val got = Registry.all.find(_.name == "q211_video_neardup").get
      .build(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
                 (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val want = docIds
      .filter(id => id % 3 == 0 && Y4mCodec.nFrames(id) >= 3)
      .map { id =>
        val n = Y4mCodec.nFrames(id).toLong - 1
        ((id * 2, id * 2 + 1), (n, n, 1L))
      }.toMap
    assert(got.keySet == want.keySet,
      s"pair set mismatch: extra=${got.keySet -- want.keySet} " +
        s"missing=${want.keySet -- got.keySet}")
    got.foreach { case (k, v) =>
      assert(v == want(k), s"pair $k: got $v want ${want(k)}")
    }
    // liveness: the fixture genuinely produced multi-frame runs
    assert(want.values.exists(_._2 >= 2L), "no run longer than one frame")
  }

  test("frame fingerprints are genuinely content-addressed: a one-pixel " +
       "corruption breaks the match") {
    // decode a full/trimmed pair, flip one luma byte in the trimmed
    // copy's first frame, re-fingerprint driver-side: the corrupted
    // frame must no longer share a fingerprint with any original frame
    val id = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
      .find(i => i % 3 == 0 && Y4mCodec.nFrames(i) >= 3).get
    def sigs(bytes: Array[Byte]): Seq[String] = {
      val (_, _, frames) = Y4mCodec.decode(bytes)
      frames.map { case (yp, _, _) =>
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(yp.mkString(",").getBytes("UTF-8"))
      }
    }
    val full = sigs(Y4mCodec.encode(id))
    val trimmedBytes = Y4mCodec.encodeFrom(id, 1)
    val clean = sigs(trimmedBytes)
    assert(clean.forall(full.contains), "clean trim must share every frame")
    // flip one luma byte inside the first FRAME payload (after the
    // stream header + "FRAME\n")
    val hdrEnd = trimmedBytes.indexOf('\n'.toByte) + 1 + "FRAME\n".length
    trimmedBytes(hdrEnd) = ((trimmedBytes(hdrEnd) + 1) & 0x7f).toByte
    val corrupt = sigs(trimmedBytes)
    assert(!full.contains(corrupt.head),
      "a corrupted frame still matched — fingerprints are not content bytes")
    assert(corrupt.tail.forall(full.contains),
      "corruption leaked into untouched frames")
  }
}
