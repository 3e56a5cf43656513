package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps.WavCodec

/** q184's parser held against the JDK's INDEPENDENT WAV decoder
  * (AudioSystem.getAudioInputStream ships its own RIFF reader — it is
  * not our code path), plus the format-quirk coverage that makes the
  * lane a real decoder test: chunk walking, fmt validation,
  * little-endian signed PCM16, and ragged sample counts all have to be
  * honored or the differentials fail.
  */
class WavSpec extends AnyFunSuite with SparkTestBase {

  private val probeIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 5L, 7L, 11L, 17L, 62L, 110L)

  test("own parser == AudioSystem's decoder, sample for sample") {
    probeIds.foreach { id =>
      val bytes = WavCodec.encode(id)
      val (sr, smp) = WavCodec.decode(bytes)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate.toInt == sr, s"doc $id: sample-rate drift")
      assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16
        && !fmt.isBigEndian, s"doc $id: unexpected reference format $fmt")
      val raw = ais.readAllBytes()
      assert(raw.length == smp.length * 2,
        s"doc $id: parser ${smp.length} samples != JDK ${raw.length / 2}")
      smp.indices.foreach { i =>
        val want = (raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xff)
        assert(smp(i) == want, s"doc $id sample $i: parser ${smp(i)} != JDK $want")
      }
    }
  }

  test("decoded samples reproduce the generator formula (encode->parse round trip exact)") {
    probeIds.foreach { id =>
      val (sr, smp) = WavCodec.decode(WavCodec.encode(id))
      assert(sr == WavCodec.SampleRate)
      assert(smp.length == WavCodec.nSamples(id), s"doc $id: sample-count drift")
      smp.indices.foreach(i => assert(smp(i) == WavCodec.sample(id, i),
        s"doc $id sample $i drifted through the round trip"))
    }
  }

  test("the corpus genuinely exercises ragged tail windows and the full signed range") {
    val tails = probeIds.map(id => WavCodec.nSamples(id) % 64)
    assert(tails.exists(_ != 0), "every count is a multiple of the window")
    val all = probeIds.flatMap(id =>
      (0 until WavCodec.nSamples(id)).map(i => WavCodec.sample(id, i)))
    assert(all.exists(_ < -16384) && all.exists(_ > 16384),
      "samples never leave the low amplitude range — sign bugs could hide")
  }

  test("q184 output matches a driver-side decode+energy recompute") {
    val got = ops.MultimodalOps.wavDecodeEnergy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
                 r.getLong(4))).toSeq
    val want = got.map(_._1).distinct.sorted.flatMap { id =>
      val (sr, smp) = WavCodec.decode(WavCodec.encode(id))
      val nWin = (smp.length + 63) / 64
      (0 until nWin).map { i =>
        val lo = i * 64
        val hi = math.min(lo + 64, smp.length)
        val e = (lo until hi).map(j => smp(j).toLong * smp(j)).sum
        (id, sr, i, hi - lo, e)
      }
    }
    assert(got == want)
  }
}
