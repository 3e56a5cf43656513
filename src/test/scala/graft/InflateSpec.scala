package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GzipIngest

/** q196's decompressor held against the JDK's INDEPENDENT
  * implementations in both framings: raw DEFLATE streams from Deflater
  * (whose block-splitting and Huffman choices we do not control) must
  * inflate byte-for-byte, and our own gzip framing must be accepted by
  * GZIPInputStream. Every DEFLATE block type, the overlapping-LZ77
  * case, all optional header fields and trailer corruption are driven
  * explicitly.
  */
class InflateSpec extends AnyFunSuite with SparkTestBase {

  private def deflate(raw: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level, true)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def rng(seed: Long): java.util.Random = new java.util.Random(seed)

  private def corpora: Seq[(String, Array[Byte])] = {
    val r = rng(42)
    Seq(
      "empty" -> Array.emptyByteArray,
      "one byte" -> Array[Byte](65),
      "tiny ascii" -> "abcabcabc".getBytes("UTF-8"),
      // high-entropy: incompressible, stored blocks at every level
      "random 100k" -> Array.fill(100000)((r.nextInt(256) - 128).toByte),
      // low-entropy: long runs -> overlapping back-references (dist < len)
      "runs" -> Array.fill(70000)('x'.toByte),
      // mixed text: dynamic Huffman territory
      "text" -> Iterator.continually(
        "the fast key order sort table scan merge part window ")
        .take(2000).mkString.getBytes("UTF-8"),
      // period-3 repeats: dist=3 copies with len >> dist
      "period3" -> Iterator.continually("abc").take(30000).mkString.getBytes("UTF-8"))
  }

  test("own inflate == Inflater's output for every corpus x level, byte for byte") {
    for ((name, raw) <- corpora; level <- Seq(0, 1, 6, 9)) {
      val comp = deflate(raw, level)
      val (got, after, _) = GzipIngest.inflate(comp, 0)
      assert(after == comp.length, s"$name@$level: trailing garbage position")
      assert(java.util.Arrays.equals(got, raw),
        s"$name@$level: inflate drifted (${got.length} vs ${raw.length} bytes)")
    }
  }

  test("the spec corpus exercises all three DEFLATE block types") {
    val stats = for ((_, raw) <- corpora; level <- Seq(0, 1, 6, 9))
      yield GzipIngest.inflate(deflate(raw, level), 0)._3
    assert(stats.exists(_.stored > 0), "no stored block decoded")
    assert(stats.exists(_.fixedH > 0), "no fixed-Huffman block decoded")
    assert(stats.exists(_.dynamicH > 0), "no dynamic-Huffman block decoded")
  }

  test("own gzip framing is accepted by GZIPInputStream, payload intact") {
    for ((name, raw) <- corpora; level <- Seq(0, 6)) {
      val member = GzipIngest.gzip(raw, level, s"$name.bin")
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(member))
      val got = in.readAllBytes()
      assert(java.util.Arrays.equals(got, raw),
        s"$name@$level: JDK reader disagrees with our framing")
    }
  }

  test("own member parser handles every optional header field") {
    val raw = "header field walk".getBytes("UTF-8")
    val body = deflate(raw, 6)
    val crc = new java.util.zip.CRC32(); crc.update(raw)
    def trailer: Array[Byte] = {
      val c = crc.getValue; val n = raw.length.toLong
      Array(c, c >> 8, c >> 16, c >> 24, n, n >> 8, n >> 16, n >> 24)
        .map(v => (v & 0xff).toByte)
    }
    // FTEXT + FEXTRA + FNAME + FCOMMENT + FHCRC all at once
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(Array[Byte](0x1f, 0x8b.toByte, 8, (1 | 2 | 4 | 8 | 16).toByte,
      0, 0, 0, 0, 0, 255.toByte))
    hdr.write(Array[Byte](4, 0)) // XLEN=4
    hdr.write("EXTR".getBytes("US-ASCII"))
    hdr.write("a name".getBytes("US-ASCII")); hdr.write(0)
    hdr.write("a comment".getBytes("US-ASCII")); hdr.write(0)
    val head = hdr.toByteArray
    val hcrc = new java.util.zip.CRC32(); hcrc.update(head)
    val member = new java.io.ByteArrayOutputStream()
    member.write(head)
    member.write((hcrc.getValue & 0xff).toInt)
    member.write(((hcrc.getValue >> 8) & 0xff).toInt)
    member.write(body); member.write(trailer)
    val bytes = member.toByteArray
    val (got, _) = GzipIngest.gunzipMember(bytes)
    assert(new String(got, "UTF-8") == "header field walk")
    // and the JDK agrees the member is well-formed
    val jdk = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes)).readAllBytes()
    assert(java.util.Arrays.equals(jdk, got))
  }

  test("own zlib parser == Inflater for every corpus x level; Adler-32 verify fires") {
    for ((name, raw) <- corpora; level <- Seq(0, 6, 9)) {
      // Deflater with nowrap=false emits a zlib (RFC 1950) stream
      val d = new java.util.zip.Deflater(level, false)
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val z = out.toByteArray
      val (got, _) = GzipIngest.unzlib(z)
      assert(java.util.Arrays.equals(got, raw), s"$name@$level: zlib payload drift")
      if (raw.nonEmpty) {
        val bad = z.clone()
        bad(bad.length - 2) = (bad(bad.length - 2) ^ 1).toByte
        val e = intercept[IllegalArgumentException](GzipIngest.unzlib(bad))
        assert(e.getMessage.contains("Adler-32"))
      }
    }
    // own Adler-32 against the JDK's implementation
    val r = rng(7)
    val sample = Array.fill(50000)((r.nextInt(256) - 128).toByte)
    val jdk = new java.util.zip.Adler32()
    jdk.update(sample)
    assert(GzipIngest.adler32(sample) == jdk.getValue)
  }

  test("own table-driven CRC-32 == java.util.zip.CRC32, incl. offset slices") {
    val r = rng(11)
    Seq(0, 1, 7, 100, 65536).foreach { n =>
      val data = Array.fill(n)((r.nextInt(256) - 128).toByte)
      val jdk = new java.util.zip.CRC32()
      jdk.update(data)
      assert(GzipIngest.crc32(data) == jdk.getValue, s"length $n")
    }
    val data = Array.fill(1000)((r.nextInt(256) - 128).toByte)
    val jdk = new java.util.zip.CRC32()
    jdk.update(data, 137, 500)
    assert(GzipIngest.crc32(data, 137, 500) == jdk.getValue, "offset slice")
  }

  test("trailer verification actually fires") {
    val raw = "corruption must not pass silently".getBytes("UTF-8")
    val member = GzipIngest.gzip(raw, 6, "x")
    // flip one bit in the CRC32 trailer field
    val bad = member.clone()
    bad(bad.length - 8) = (bad(bad.length - 8) ^ 1).toByte
    val e = intercept[IllegalArgumentException](GzipIngest.gunzipMember(bad))
    assert(e.getMessage.contains("CRC32 mismatch"))
    // and a payload bit-flip is caught too (CRC over the OUTPUT bytes)
    val bad2 = member.clone()
    // corrupt inside the compressed body (after the 10+name header)
    bad2(member.indexOf(0.toByte, 10) + 3) =
      (bad2(member.indexOf(0.toByte, 10) + 3) ^ 0x10).toByte
    intercept[Exception](GzipIngest.gunzipMember(bad2))
  }

  test("q196 output matches a driver-side decompress+hash recompute") {
    val got = ops.CoreOps.gzipIngest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSeq
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got.map(_._1) == docs.map(_._1))
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.zip(got).foreach { case ((id, text), (gid, lvl, rawLen, hash)) =>
      assert(gid == id)
      assert(lvl == GzipIngest.levelFor(id))
      assert(rawLen == text.length.toLong)
      val want = md.digest(text.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(hash == want, s"doc $id: md5 drift through the gzip round trip")
    }
  }

  test("the staged corpus genuinely contains all three block types across levels") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(40)
    val stats = docs.map { case (id, text) =>
      val member = GzipIngest.gzip(
        text.getBytes("UTF-8"), GzipIngest.levelFor(id), s"doc_$id.txt")
      GzipIngest.gunzipMember(member)._2
    }
    assert(stats.exists(_.stored > 0), "corpus: no stored block")
    assert(stats.exists(_.dynamicH > 0), "corpus: no dynamic-Huffman block")
  }
}
