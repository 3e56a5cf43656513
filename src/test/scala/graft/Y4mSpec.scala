package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps.Y4mCodec

/** q197's container, honestly guarded: the JDK has no Y4M codec, so
  * (unlike the BMP/WAV/PNG/GIF/µ-law lanes) no independent decoder
  * exists in this environment. The compensating guards: golden-byte
  * layout pinning (expected container bytes assembled LONGHAND here,
  * not by calling the writer), a foreign-flavor hand-authored stream
  * the writer never emits, and exact BT.601 conversion vectors checked
  * against hand-computed fixed-point arithmetic.
  */
class Y4mSpec extends AnyFunSuite with SparkTestBase {

  private val probeIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 5L, 7L, 11L, 19L)

  test("golden bytes: the writer emits exactly the layout the format specifies") {
    // id=0: W8 H6, 2 frames. Assemble expected bytes longhand — header
    // string, then per frame the marker line and the three planes in
    // Y-then-U-then-V order, chroma at quarter resolution.
    val id = 0L
    val (w, h) = (8, 6)
    val expect = new java.io.ByteArrayOutputStream()
    expect.write("YUV4MPEG2 W8 H6 F25:1 Ip A1:1 C420jpeg XYSCSS=420JPEG\n"
      .getBytes("US-ASCII"))
    (0 until 2).foreach { f =>
      expect.write("FRAME\n".getBytes("US-ASCII"))
      for (y <- 0 until h; x <- 0 until w) expect.write(Y4mCodec.lumaY(id, f, x, y))
      for (cy <- 0 until h / 2; cx <- 0 until w / 2)
        expect.write(Y4mCodec.chromaU(id, f, cx, cy))
      for (cy <- 0 until h / 2; cx <- 0 until w / 2)
        expect.write(Y4mCodec.chromaV(id, f, cx, cy))
    }
    assert(java.util.Arrays.equals(Y4mCodec.encode(id), expect.toByteArray),
      "writer layout drifted from the YUV4MPEG2 plane order")
    // and the size arithmetic: header + n * (6 + w*h + 2*(w/2)*(h/2))
    assert(Y4mCodec.encode(id).length == 54 + 2 * (6 + 48 + 2 * 12))
  }

  test("a foreign-flavor stream (different rate, interlacing, X params, frame params) parses") {
    val out = new java.io.ByteArrayOutputStream()
    out.write("YUV4MPEG2 W4 H2 F30000:1001 It A4:3 C420mpeg2 Xfoo=bar\n"
      .getBytes("US-ASCII"))
    out.write("FRAME Xtimecode=00:00\n".getBytes("US-ASCII"))
    val yP = Array(10, 20, 30, 40, 50, 60, 70, 80)
    val uP = Array(90, 100)
    val vP = Array(110, 120)
    (yP ++ uP ++ vP).foreach(out.write)
    val (w, h, frames) = Y4mCodec.decode(out.toByteArray)
    assert((w, h) == (4, 2) && frames.length == 1)
    assert(frames(0)._1.toSeq == yP.toSeq)
    assert(frames(0)._2.toSeq == uP.toSeq)
    assert(frames(0)._3.toSeq == vP.toSeq)
  }

  test("malformed streams fail loudly") {
    intercept[IllegalArgumentException](
      Y4mCodec.decode("JUNK W4 H2 C420\nFRAME\n".getBytes("US-ASCII")))
    // odd dims are illegal for 4:2:0
    intercept[IllegalArgumentException](
      Y4mCodec.decode("YUV4MPEG2 W3 H2 C420jpeg\nFRAME\n".getBytes("US-ASCII")))
    // truncated frame payload
    val t = new java.io.ByteArrayOutputStream()
    t.write("YUV4MPEG2 W4 H2 C420jpeg\nFRAME\n".getBytes("US-ASCII"))
    t.write(Array.fill(5)(1.toByte)) // needs 8 + 2 + 2 = 12 bytes
    intercept[IllegalArgumentException](Y4mCodec.decode(t.toByteArray))
    // 4:2:2 layouts are not this parser's claim
    intercept[IllegalArgumentException](
      Y4mCodec.decode("YUV4MPEG2 W4 H2 C422\nFRAME\n".getBytes("US-ASCII")))
  }

  test("BT.601 conversion matches hand-computed fixed-point vectors") {
    // black (studio): Y=16 U=V=128 -> (0,0,0)
    assert(Y4mCodec.yuv2rgb(16, 128, 128) == ((0, 0, 0)))
    // white (studio): Y=235 -> 298*219+128 = 65390 >> 8 = 255
    assert(Y4mCodec.yuv2rgb(235, 128, 128) == ((255, 255, 255)))
    // saturated red chroma at black luma must CLAMP at 0 (G, B) —
    // hand: C=0, E=112 -> R=(409*112+128)>>8=179; G=(-208*112+128)>>8
    // = -90 -> 0; B = 0*516... D=0 -> B=(128)>>8=0
    assert(Y4mCodec.yuv2rgb(16, 128, 240) == ((179, 0, 0)))
    // mid gray: Y=126 -> (298*110+128)>>8 = 128
    assert(Y4mCodec.yuv2rgb(126, 128, 128) == ((128, 128, 128)))
  }

  test("round trip: every probe doc's planes survive encode->decode exactly") {
    probeIds.foreach { id =>
      val (w, h, frames) = Y4mCodec.decode(Y4mCodec.encode(id))
      assert((w, h) == Y4mCodec.dims(id) && frames.length == Y4mCodec.nFrames(id))
      frames.indices.foreach { f =>
        val (yp, up, vp) = frames(f)
        for (y <- 0 until h; x <- 0 until w)
          assert(yp(y * w + x) == Y4mCodec.lumaY(id, f, x, y),
            s"doc $id frame $f luma ($x,$y)")
        for (cy <- 0 until h / 2; cx <- 0 until w / 2) {
          assert(up(cy * (w / 2) + cx) == Y4mCodec.chromaU(id, f, cx, cy))
          assert(vp(cy * (w / 2) + cx) == Y4mCodec.chromaV(id, f, cx, cy))
        }
      }
    }
  }

  test("the corpus genuinely exercises RGB clamping (else the LEAST/GREATEST is dead code)") {
    val clamped = probeIds.exists { id =>
      val (w, h) = Y4mCodec.dims(id)
      (0 until Y4mCodec.nFrames(id)).exists { f =>
        (0 until h).exists(y => (0 until w).exists { x =>
          val c = Y4mCodec.lumaY(id, f, x, y) - 16
          val d = Y4mCodec.chromaU(id, f, x / 2, y / 2) - 128
          val e = Y4mCodec.chromaV(id, f, x / 2, y / 2) - 128
          val raw = Seq((298 * c + 409 * e + 128) >> 8,
            (298 * c - 100 * d - 208 * e + 128) >> 8,
            (298 * c + 516 * d + 128) >> 8)
          raw.exists(v => v < 0 || v > 255)
        })
      }
    }
    assert(clamped, "no probe pixel ever clamps — widen the chroma formula range")
  }

  test("q197 output matches a driver-side decode+convert recompute") {
    val got = ops.MultimodalOps.y4mFrameRgb(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
                 r.getInt(4), r.getLong(5), r.getLong(6), r.getLong(7),
                 r.getLong(8))).toSeq
    val want = got.map(_._1).distinct.sorted.flatMap { id =>
      val (w, h, frames) = Y4mCodec.decode(Y4mCodec.encode(id))
      frames.indices.filter(_ % 2 == 0).map { f =>
        val (yp, up, vp) = frames(f)
        var sr = 0L; var sg = 0L; var sb = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val (r, g, b) = Y4mCodec.yuv2rgb(yp(y * w + x),
            up((y / 2) * (w / 2) + x / 2), vp((y / 2) * (w / 2) + x / 2))
          sr += r; sg += g; sb += b
        }
        val motion = if (f == 0) 0L else
          yp.indices.map(k => math.abs(yp(k) - frames(f - 1)._1(k)).toLong).sum
        (id, frames.length, f, w, h, sr, sg, sb, motion)
      }
    }
    assert(got == want)
  }
}
