package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps.UlawCodec

/** q195's codec held against the JDK's INDEPENDENT G.711 implementation
  * (AudioSystem's ULAW converter is not our code path) in BOTH
  * directions, plus proof the lane is genuinely lossy — a companding
  * codec that round-trips exactly would mean the fixture never leaves
  * the first segment and the oracle's encode branch is untested.
  */
class UlawSpec extends AnyFunSuite with SparkTestBase {

  private val probeIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 5L, 7L, 11L, 17L, 62L, 96L)

  private def jdkCompand(pcm: Array[Int]): Array[Int] = {
    import javax.sound.sampled._
    val n = pcm.length
    val raw = new Array[Byte](n * 2)
    pcm.indices.foreach { i =>
      raw(2 * i) = (pcm(i) & 0xff).toByte
      raw(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
    }
    val src = new AudioFormat(8000f, 16, 1, true, false)
    val dst = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val conv = AudioSystem.getAudioInputStream(dst,
      new AudioInputStream(new java.io.ByteArrayInputStream(raw), src, n.toLong))
    conv.readAllBytes().map(_ & 0xff)
  }

  private def jdkExpand(codes: Array[Int]): Array[Int] = {
    import javax.sound.sampled._
    val n = codes.length
    val raw = codes.map(_.toByte)
    val src = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val dst = new AudioFormat(8000f, 16, 1, true, false)
    val conv = AudioSystem.getAudioInputStream(dst,
      new AudioInputStream(new java.io.ByteArrayInputStream(raw), src, n.toLong))
    val out = conv.readAllBytes()
    Array.tabulate(n)(i => (out(2 * i + 1).toInt << 8) | (out(2 * i) & 0xff))
  }

  test("own closed-form compressor == JDK converter byte-for-byte over the fixture domain") {
    // sweep the full ±32000 fixture range densely plus every segment edge
    val edges = Seq(0, 1, -1, 31, 32, 95, 96, 127, 128, 255, 256, 511, 512,
      1023, 1024, 2047, 2048, 4095, 4096, 8191, 8192, 16383, 16384, 31999,
      32000, -32000).map(identity)
    val sweep = (-32000 to 32000 by 7) ++ edges
    val pcm = sweep.toArray
    val jdk = jdkCompand(pcm)
    pcm.indices.foreach { i =>
      assert(UlawCodec.encodeSample(pcm(i)) == jdk(i),
        s"pcm=${pcm(i)}: own ${UlawCodec.encodeSample(pcm(i))} != jdk ${jdk(i)}")
    }
  }

  test("own expander == JDK converter for ALL 256 mu-law codes") {
    val codes = (0 until 256).toArray
    val jdk = jdkExpand(codes)
    codes.foreach { c =>
      assert(UlawCodec.decodeSample(c) == jdk(c),
        s"code=$c: own ${UlawCodec.decodeSample(c)} != jdk ${jdk(c)}")
    }
  }

  test("own parser == AudioSystem's read path, sample for sample") {
    import javax.sound.sampled._
    probeIds.foreach { id =>
      val bytes = UlawCodec.encode(id)
      val (sr, smp) = UlawCodec.decode(bytes)
      assert(sr == UlawCodec.SampleRate)
      // the JDK reads its own container back and expands to PCM16
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pcmFmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
      val conv = AudioSystem.getAudioInputStream(pcmFmt, ais)
      val raw = conv.readAllBytes()
      assert(raw.length == smp.length * 2,
        s"doc $id: parser ${smp.length} samples != JDK ${raw.length / 2}")
      smp.indices.foreach { i =>
        val want = (raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xff)
        assert(smp(i) == want, s"doc $id sample $i: parser ${smp(i)} != JDK $want")
      }
    }
  }

  test("the codec is genuinely lossy and every exponent segment is exercised") {
    val all = probeIds.flatMap(id =>
      (0 until UlawCodec.nSamples(id)).map(i => UlawCodec.sample(id, i)))
    val err = all.map(v => math.abs(
      UlawCodec.decodeSample(UlawCodec.encodeSample(v)) - v))
    assert(err.exists(_ > 0), "companding introduced zero error — lane is trivial")
    assert(err.max <= 1024, s"error ${err.max} beyond the top-segment step size")
    val segs = all.map(v => (UlawCodec.encodeSample(v) ^ 0xff) >> 4 & 7).distinct
    assert(segs.size == 8, s"only segments $segs exercised")
  }

  test("q195 output matches a driver-side decode+energy recompute") {
    val got = ops.MultimodalOps.ulawDecodeEnergy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
                 r.getLong(4), r.getLong(5))).toSeq
    val want = got.map(_._1).distinct.sorted.flatMap { id =>
      val (sr, smp) = UlawCodec.decode(UlawCodec.encode(id))
      val nWin = (smp.length + 63) / 64
      (0 until nWin).map { i =>
        val lo = i * 64
        val hi = math.min(lo + 64, smp.length)
        val e = (lo until hi).map(j => smp(j).toLong * smp(j)).sum
        val ds = (lo until hi).map(j => smp(j).toLong).sum
        (id, sr, i, hi - lo, e, ds)
      }
    }
    assert(got == want)
  }
}
