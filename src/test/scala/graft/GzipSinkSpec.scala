package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GzipIngest

/** q207's encoder held against the decoders we do NOT control: every
  * own-encoded member must be accepted byte-for-byte by the JDK's
  * GZIPInputStream and by raw Inflater, across adversarial corpora —
  * and the compression must be real (LZ77 matches fire), not literal
  * pass-through.
  */
class GzipSinkSpec extends AnyFunSuite with SparkTestBase {

  private def corpora: Seq[(String, Array[Byte])] = {
    val r = new java.util.Random(42)
    Seq(
      "empty" -> Array.emptyByteArray,
      "one byte" -> Array[Byte](65),
      "two bytes" -> "ab".getBytes("UTF-8"),
      "runs" -> Array.fill(70000)('x'.toByte),
      "period3" -> Iterator.continually("abc").take(30000).mkString.getBytes("UTF-8"),
      "text" -> Iterator.continually(
        "the fast key order sort table scan merge part window ")
        .take(2000).mkString.getBytes("UTF-8"),
      "random 64k" -> Array.fill(65536)((r.nextInt(256) - 128).toByte),
      // every byte value, incl. the 9-bit literal range 144..255
      "all bytes" -> Array.tabulate(4096)(i => i.toByte))
  }

  test("JDK GZIPInputStream accepts every own-encoded member, byte for byte") {
    corpora.foreach { case (name, raw) =>
      val member = GzipIngest.gzipOwn(raw, s"$name.bin")
      val jdk = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(member)).readAllBytes()
      assert(java.util.Arrays.equals(jdk, raw), s"$name: JDK decode drift")
    }
  }

  test("raw Inflater accepts every own DEFLATE stream") {
    corpora.foreach { case (name, raw) =>
      // javadoc'd Inflater(nowrap) quirk: a dummy byte is required
      // after the compressed data for finished() to trip
      val comp = GzipIngest.deflateFixed(raw) :+ 0.toByte
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(comp)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput()) fail(s"$name: Inflater stalled")
        out.write(buf, 0, k)
      }
      inf.end()
      assert(java.util.Arrays.equals(out.toByteArray, raw), s"$name: payload drift")
    }
  }

  test("own reader round-trips own members (and the member stats say fixed-Huffman)") {
    corpora.foreach { case (name, raw) =>
      val (got, stats) = GzipIngest.gunzipMember(GzipIngest.gzipOwn(raw, name))
      assert(java.util.Arrays.equals(got, raw), s"$name: own round trip drift")
      assert(stats.fixedH == 1 && stats.stored == 0 && stats.dynamicH == 0,
        s"$name: expected one fixed-Huffman block, got $stats")
    }
  }

  test("compression is real: matches fire, repetitive input collapses") {
    val runs = Array.fill(70000)('x'.toByte)
    val comp = GzipIngest.deflateFixed(runs)
    assert(comp.length < 1500,
      s"70000-byte run compressed to ${comp.length} — LZ77 matching is not firing")
    val text = Iterator.continually(
      "the fast key order sort table scan merge part window ")
      .take(2000).mkString.getBytes("UTF-8")
    val tcomp = GzipIngest.deflateFixed(text)
    assert(tcomp.length * 2 < text.length,
      s"text compressed ${text.length} -> ${tcomp.length}: ratio worse than 2x")
  }

  test("q207 output matches a driver-side encode+decode recompute") {
    val got = ops.CoreOps.gzipSink(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = docs.map { case (id, text) =>
      val roundTrip = new String(GzipIngest.gunzipMember(
        GzipIngest.gzipOwn(text.getBytes("UTF-8"), s"doc_$id.txt"))._1, "UTF-8")
      assert(roundTrip == text)
      (id, text.length.toLong,
        md.digest(text.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString)
    }
    assert(got == want)
  }
}
