package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps.GifCodec

/** q190's parser held against the JDK's INDEPENDENT GIF decoder
  * (ImageIO's reader — its own block walk and LZW path), plus direct
  * LZW edge coverage (KwKwK, dictionary growth, clear handling come
  * from whatever the JDK encoder emits — the differential proves them
  * on real streams) and the loud-failure checks that make the lane a
  * real decoder test.
  */
class GifSpec extends AnyFunSuite with SparkTestBase {

  private val probeIds: Seq[Long] =
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 11L, 17L, 34L, 62L, 98L)

  test("own parser == ImageIO reader, frame for frame, pixel for pixel") {
    probeIds.foreach { id =>
      val bytes = GifCodec.encode(id)
      val (w, h, frames) = GifCodec.decodeFrames(bytes)
      val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rdr.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      assert(rdr.getNumImages(true) == frames.length,
        s"doc $id: ImageIO sees ${rdr.getNumImages(true)} frames, parser ${frames.length}")
      for (f <- frames.indices) {
        val img = rdr.read(f)
        assert((img.getWidth, img.getHeight) == (w, h), s"doc $id frame $f dims")
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = img.getRGB(x, y)
          val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          assert(r == g && g == b, s"doc $id f=$f ($x,$y): non-gray reference")
          assert(frames(f)(y * w + x) == b,
            s"doc $id f=$f ($x,$y): parser ${frames(f)(y * w + x)} != ImageIO $b")
        }
      }
      rdr.dispose()
    }
  }

  test("decoded frames reproduce the generator formula (encode->LZW->palette exact)") {
    var minV = Int.MaxValue; var maxV = Int.MinValue
    probeIds.foreach { id =>
      val (w, h, frames) = GifCodec.decodeFrames(GifCodec.encode(id))
      assert((w, h) == GifCodec.dims(id))
      assert(frames.length == GifCodec.nFrames(id),
        s"doc $id: ${frames.length} frames != ${GifCodec.nFrames(id)}")
      for (f <- frames.indices; y <- 0 until h; x <- 0 until w) {
        val v = frames(f)(y * w + x)
        assert(v == GifCodec.pixel(id, f, x, y),
          s"doc $id f=$f ($x,$y) drifted through the round trip")
        minV = math.min(minV, v); maxV = math.max(maxV, v)
      }
    }
    // the r10 range-coverage lesson: the formula must actually span
    // the value domain or the codec test is weaker than it looks
    assert(minV < 10 && maxV > 240,
      s"pixel values only span [$minV,$maxV] — formula not exercising the range")
  }

  test("malformed inputs fail loudly (no silent garbage frames)") {
    val good = GifCodec.encode(3L)
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](GifCodec.decodeFrames(badSig))
      .getMessage.contains("signature"))
    // truncating mid-stream must throw, not return short frames
    intercept[Exception](GifCodec.decodeFrames(good.take(good.length / 2)))
  }

  test("LZW decoder handles the KwKwK case on a hand-built minimal stream") {
    // minCode=2: clear=4, eoi=5, next dict entry=6. Stream
    // clear, 0, 6 is the canonical KwKwK: code 6 is USED before it is
    // defined — the decoder must emit prev + firstOf(prev) = "0","0"
    // and define 6 as that very string. All codes fit in 3 bits.
    def pack(codes: Seq[Int]): Array[Byte] = {
      var acc = 0L; var bits = 0
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      codes.foreach { c =>
        acc |= c.toLong << bits; bits += 3
        while (bits >= 8) { bytes += (acc & 0xff).toByte; acc >>= 8; bits -= 8 }
      }
      if (bits > 0) bytes += (acc & 0xff).toByte
      bytes.toArray
    }
    assert(GifCodec.lzwDecode(pack(Seq(4, 0, 6, 5)), 2, 3).toSeq ==
      Seq(0, 0, 0))
    // reuse of a defined entry: clear, 0, 1 (defines 6="01"), 6 -> 0 1 0 1
    assert(GifCodec.lzwDecode(pack(Seq(4, 0, 1, 6)), 2, 4).toSeq ==
      Seq(0, 1, 0, 1))
    // a code beyond dictN+1 is corruption, not KwKwK
    intercept[IllegalArgumentException](
      GifCodec.lzwDecode(pack(Seq(4, 0, 7, 5)), 2, 9))
  }

  test("4-pass interlaced frames decode identically (writer default mode)") {
    Seq(3L, 6L, 11L).foreach { id =>
      val bytes = GifCodec.encodeFrames(id, interlaced = true)
      val (w, h, frames) = GifCodec.decodeFrames(bytes)
      assert((w, h) == GifCodec.dims(id))
      // the default mode must actually interlace, or this test silently
      // stops covering the deinterlacer
      assert(!java.util.Arrays.equals(bytes, GifCodec.encodeFrames(id, interlaced = false)),
        s"doc $id: writer default produced the same bytes as MODE_DISABLED")
      val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rdr.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      for (f <- frames.indices; y <- 0 until h; x <- 0 until w)
        assert(frames(f)(y * w + x) == GifCodec.pixel(id, f, x, y),
          s"doc $id f=$f ($x,$y): interlaced decode drifted")
      for (f <- frames.indices) {
        val img = rdr.read(f)
        for (y <- 0 until h; x <- 0 until w)
          assert((img.getRGB(x, y) & 0xff) == frames(f)(y * w + x),
            s"doc $id f=$f ($x,$y): parser != ImageIO on interlaced input")
      }
      rdr.dispose()
    }
  }

  test("q190 output matches a driver-side decode+feature recompute") {
    val got = ops.MultimodalOps.gifFrameFeatures(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
                 r.getInt(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.nonEmpty)
    val want = got.map(_._1).distinct.sorted.flatMap { id =>
      val (w, h, frames) = GifCodec.decodeFrames(GifCodec.encode(id))
      frames.indices.filter(_ % 2 == 0).map { f =>
        var sum = 0L; var motion = 0L
        for (k <- 0 until w * h) {
          sum += frames(f)(k)
          if (f > 0) motion += math.abs(frames(f)(k) - frames(f - 1)(k))
        }
        (id, frames.length, f, w, h, sum, motion)
      }
    }
    assert(got == want)
  }
}
