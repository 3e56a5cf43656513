package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps.PngCodec

/** q186's parser held against the JDK's INDEPENDENT PNG decoder
  * (ImageIO.read — its own chunk/inflate/unfilter path), plus direct
  * unit coverage of all five row unfilters against hand-built rows
  * (the encoder chooses filters adaptively, so a given corpus may not
  * exercise every type — the unit tests close that gap) and the
  * CRC/format-quirk checks that make the lane a real decoder test.
  */
class PngSpec extends AnyFunSuite with SparkTestBase {

  private val probeIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 5L, 7L, 11L, 17L, 62L, 98L)

  test("own parser == ImageIO.read, pixel for pixel, across dims/filter variants") {
    probeIds.foreach { id =>
      val bytes = PngCodec.encode(id)
      val (w, h, px) = PngCodec.decode(bytes)
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

  test("decoded pixels reproduce the generator formula (encode->inflate->unfilter exact)") {
    probeIds.foreach { id =>
      val (w, h, px) = PngCodec.decode(PngCodec.encode(id))
      assert((w, h) == PngCodec.dims(id))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == PngCodec.pixel(id, x, y),
          s"doc $id ($x,$y) drifted through the round trip")
    }
  }

  // reference implementations for building synthetic FILTERED rows
  private def paethRef(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  test("each of the five unfilters inverts its filter on hand-built rows") {
    val bpp = 3
    val rng = new scala.util.Random(42)
    val prev = Array.fill(4 * bpp)(rng.nextInt(256).toByte)
    val want = Array.fill(4 * bpp)(rng.nextInt(256).toByte)
    def left(arr: Array[Byte], i: Int) = if (i >= bpp) arr(i - bpp) & 0xff else 0
    for (ft <- 0 to 4) {
      val filtered = Array.tabulate(want.length) { i =>
        val raw = want(i) & 0xff
        val pred = ft match {
          case 0 => 0
          case 1 => left(want, i)
          case 2 => prev(i) & 0xff
          case 3 => (left(want, i) + (prev(i) & 0xff)) / 2
          case 4 => paethRef(left(want, i), prev(i) & 0xff,
                             if (i >= bpp) prev(i - bpp) & 0xff else 0)
        }
        ((raw - pred) & 0xff).toByte
      }
      PngCodec.unfilterRow(ft, filtered, prev, bpp)
      assert(filtered.toSeq == want.toSeq, s"filter type $ft did not invert")
    }
    intercept[IllegalArgumentException] {
      PngCodec.unfilterRow(7, new Array[Byte](bpp), new Array[Byte](bpp), bpp)
    }
  }

  test("corrupting any byte breaks the CRC check (the walk genuinely verifies)") {
    val bytes = PngCodec.encode(3L)
    // flip one byte inside the first IDAT's data
    val idx = {
      var pos = 8; var found = -1
      while (found < 0) {
        val len = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
          ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
        if (ctype == "IDAT") found = pos + 8 else pos = pos + 8 + len + 4
      }
      found
    }
    val corrupt = bytes.clone()
    corrupt(idx) = (corrupt(idx) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decode(corrupt))
    assert(e.getMessage.contains("CRC"), s"unexpected failure: ${e.getMessage}")
  }

  test("filter-type usage across the corpus is recorded (encoder-chosen, adaptive)") {
    val seen = probeIds.flatMap { id =>
      PngCodec.decodeFull(PngCodec.encode(id))._4.toSeq
    }.groupBy(_._1).map { case (ft, xs) => ft -> xs.map(_._2).sum }
    info(s"JDK-encoder filter types used: ${seen.toSeq.sorted.mkString(", ")}")
    assert(seen.nonEmpty && seen.keys.forall(ft => ft >= 0 && ft <= 4))
  }

  test("q186 output matches a driver-side decode+gradient recompute") {
    val got = ops.MultimodalOps.pngDecodeGradient(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSeq
    val want = got.map(_._1).sorted.map { id =>
      val (w, h, px) = PngCodec.decode(PngCodec.encode(id))
      var sum = 0L; var gh = 0L; var gv = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(y * w + x)
        sum += v
        if (x + 1 < w) gh += math.abs(px(y * w + x + 1) - v)
        if (y + 1 < h) gv += math.abs(px((y + 1) * w + x) - v)
      }
      (id, w, h, sum, gh, gv)
    }
    assert(got == want)
  }
}
