package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps.BmpCodec

/** q178's parser held against the JDK's INDEPENDENT BMP decoder
  * (ImageIO.read ships its own plugin — it is not our code path), plus
  * the format-quirk coverage that makes the lane a real decoder test:
  * bottom-up row order, 4-byte row padding, BGR channel order, and the
  * pixel-data offset all have to be honored or the differentials fail.
  */
class BmpSpec extends AnyFunSuite with SparkTestBase {

  private val probeIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 5L, 7L, 11L, 17L, 62L)

  test("own parser == ImageIO.read, pixel for pixel, across dims/padding variants") {
    probeIds.foreach { id =>
      val bytes = BmpCodec.encode(id)
      val (w, h, px) = BmpCodec.decode(bytes)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO could not read the doc-$id fixture")
      assert((img.getWidth, img.getHeight) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        assert(r == g && g == b, s"doc $id ($x,$y): non-gray reference pixel")
        assert(px(y * w + x) == b,
          s"doc $id ($x,$y): parser ${px(y * w + x)} != ImageIO $b")
      }
    }
  }

  test("decoded pixels reproduce the generator formula (encode->parse round trip exact)") {
    probeIds.foreach { id =>
      val (w, h, px) = BmpCodec.decode(BmpCodec.encode(id))
      assert((w, h) == BmpCodec.dims(id))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == BmpCodec.pixel(id, x, y),
          s"doc $id ($x,$y) drifted through the round trip")
    }
  }

  test("the corpus genuinely exercises row padding (width*3 % 4 != 0 for some docs)") {
    val pads = probeIds.map { id =>
      val (w, _) = BmpCodec.dims(id)
      ((w * 3 + 3) / 4) * 4 - w * 3
    }
    assert(pads.exists(_ > 0), "no padded rows — widths all multiples of 4")
    assert(pads.exists(_ == 0), "no unpadded rows — padding never the identity")
  }

  test("q178 output matches a driver-side decode+pool recompute") {
    val got = ops.MultimodalOps.bmpDecodeResize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
                 r.getInt(4), r.getLong(5), r.getLong(6))).toSeq
    val want = got.map(_._1).sorted.map { id =>
      val (w, h, px) = BmpCodec.decode(BmpCodec.encode(id))
      val (outW, outH) = (w / 2, h / 2)
      var sum = 0L; var wsum = 0L
      for (rr <- 0 until outH; cc <- 0 until outW) {
        val base = (2 * rr) * w + 2 * cc
        val p = (px(base) + px(base + 1) + px(base + w) + px(base + w + 1)) / 4
        sum += p
        wsum += p.toLong * (rr.toLong * outW + cc + 1)
      }
      (id, w, h, outW, outH, sum, wsum)
    }
    assert(got == want)
  }
}
