package graft

import graft.ops.MultimodalOps._
import org.scalatest.funsuite.AnyFunSuite

/** q40's media dispatcher, held three ways: the sniffer must identify
  * every fixture format from BYTES alone (including the RIFF fmt-tag
  * split between PCM16 and µ-law), the dispatched decode must equal
  * each owning codec's direct decode, and unknown payloads must fail
  * LOUDLY (a dispatcher that silently skips corrupts a corpus quietly).
  */
class MediaDispatchSpec extends AnyFunSuite with SparkTestBase {

  private val perType = Seq(0L -> "bmp", 1L -> "wav", 2L -> "png",
    3L -> "gif", 4L -> "ulaw", 5L -> "y4m")

  test("sniffer identifies all six formats from magic bytes alone") {
    perType.foreach { case (id, want) =>
      (0 until 4).foreach { k =>
        val docId = id + 6L * k // different dims/frame counts per k
        assert(MediaDispatch.sniff(MediaDispatch.encodeFor(docId)) == want,
          s"doc $docId should sniff as $want")
      }
    }
  }

  test("dispatched decode == the owning codec's direct decode") {
    (0L until 24L).foreach { id =>
      val bytes = MediaDispatch.encodeFor(id)
      val feat = MediaDispatch.decode(id, bytes)
      (id % 6) match {
        case 0 =>
          val (w, h, px) = BmpCodec.decode(bytes)
          assert((feat.d1, feat.d2, feat.n_units) == ((w.toLong, h.toLong, 1L)))
          assert(feat.checksum == px.foldLeft(0L)(_ + _))
        case 1 =>
          val (sr, smp) = WavCodec.decode(bytes)
          assert((feat.d1, feat.n_units) == ((sr.toLong, smp.length.toLong)))
          assert(feat.checksum == smp.foldLeft(0L)(_ + _))
        case 2 =>
          val (w, h, px) = PngCodec.decode(bytes)
          assert((feat.d1, feat.d2) == ((w.toLong, h.toLong)))
          assert(feat.checksum == px.foldLeft(0L)(_ + _))
        case 3 =>
          val (w, h, fs) = GifCodec.decodeFrames(bytes)
          assert((feat.d1, feat.d2, feat.n_units) ==
            ((w.toLong, h.toLong, fs.length.toLong)))
        case 4 =>
          val (sr, smp) = UlawCodec.decode(bytes)
          assert((feat.d1, feat.n_units) == ((sr.toLong, smp.length.toLong)))
          assert(feat.checksum == smp.foldLeft(0L)(_ + _))
        case _ =>
          val (w, h, fs) = Y4mCodec.decode(bytes)
          assert((feat.d1, feat.d2, feat.n_units) ==
            ((w.toLong, h.toLong, fs.length.toLong)))
      }
    }
  }

  test("unknown or corrupted payloads fail loudly") {
    intercept[IllegalArgumentException] {
      MediaDispatch.sniff(Array[Byte](0x7f, 'E', 'L', 'F', 0, 0, 0, 0, 0, 0, 0, 0))
    }
    // a BMP whose magic is flipped must not silently decode as anything
    val bmp = MediaDispatch.encodeFor(0L)
    bmp(0) = 'X'
    intercept[IllegalArgumentException] { MediaDispatch.sniff(bmp) }
    // a WAVE with an unsupported fmt tag is rejected at the sniff
    val wav = MediaDispatch.encodeFor(1L)
    // locate the fmt chunk and overwrite its tag with 0x0055 (MP3)
    var pos = 12
    var done = false
    while (!done) {
      val cid = new String(wav, pos, 4, "US-ASCII")
      val sz = (wav(pos + 4) & 0xff) | ((wav(pos + 5) & 0xff) << 8) |
        ((wav(pos + 6) & 0xff) << 16) | ((wav(pos + 7) & 0xff) << 24)
      if (cid == "fmt ") { wav(pos + 8) = 0x55; wav(pos + 9) = 0; done = true }
      else pos += 8 + sz + (sz & 1)
    }
    intercept[IllegalArgumentException] { MediaDispatch.sniff(wav) }
  }

  test("the q40 lane carries all six media types over the corpus") {
    val counts = Registry.all.find(_.name == "q40_multimodal").get
      .build(spark, sf)
      .groupBy("media_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == perType.map(_._2).toSet,
      s"missing media types: $counts")
    assert(counts.values.forall(_ > 0))
  }
}
