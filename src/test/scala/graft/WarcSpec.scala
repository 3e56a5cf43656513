package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GzipIngest, WarcIngest}

/** q200's record walk, guarded the q197 way (no JDK WARC reader
  * exists): golden record bytes assembled longhand, a hand-authored
  * foreign-flavor record, GZIPInputStream cross-validating the
  * concatenated-member shard framing (the JDK reader walks
  * concatenated members transparently), and Content-Length-driven
  * slicing proven against a payload full of header-look-alike bytes.
  */
class WarcSpec extends AnyFunSuite with SparkTestBase {

  test("golden bytes: the record writer emits exactly the WARC/1.0 layout") {
    val id = 7L
    val text = "ab"
    // assembled longhand: http block is 57 header bytes + 2 body bytes
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Content-Length: 2\r\n\r\nab"
    val expect = "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:doc-7>\r\n" +
      "WARC-Target-URI: http://corpus.example/doc/7\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n" +
      "\r\n" + http + "\r\n\r\n"
    assert(WarcIngest.record(id, text).toSeq ==
      expect.getBytes("US-ASCII").toSeq)
  }

  test("round trip: record -> parse recovers headers and exact payload") {
    val rec = WarcIngest.parseRecord(WarcIngest.record(42L, "the payload"))
    assert(WarcIngest.docIdOf(rec) == 42L)
    assert(rec.headers("warc-type") == "response")
    assert(new String(rec.payload, "UTF-8") == "the payload")
  }

  test("Content-Length-driven slicing: header-look-alike bytes in the body cannot confuse the walk") {
    val trap = "WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\nHTTP/1.1 500 x\r\n\r\n"
    val rec = WarcIngest.parseRecord(WarcIngest.record(3L, trap))
    assert(new String(rec.payload, "UTF-8") == trap)
  }

  test("a foreign-flavor record parses: weird header casing, extra headers, non-http content") {
    val payload = "raw resource bytes"
    val block = payload.getBytes("US-ASCII")
    val rec = ("WARC/1.1\r\n" + // a newer minor version
      "warc-type: resource\r\n" +
      "WARC-TARGET-URI: http://corpus.example/doc/9\r\n" +
      "X-Custom-Header: kept-but-unused\r\n" +
      s"content-length: ${block.length}\r\n" +
      "\r\n").getBytes("US-ASCII") ++ block ++ "\r\n\r\n".getBytes("US-ASCII")
    val parsed = WarcIngest.parseRecord(rec)
    assert(WarcIngest.docIdOf(parsed) == 9L)
    // no application/http content-type -> payload is the raw block
    assert(new String(parsed.payload, "US-ASCII") == payload)
  }

  test("malformed records fail loudly") {
    intercept[IllegalArgumentException](
      WarcIngest.parseRecord("HTTP/1.1 200 OK\r\n\r\n\r\n\r\n".getBytes("US-ASCII")))
    // truncated payload: lie about Content-Length
    val lying = ("WARC/1.0\r\nContent-Length: 999\r\n\r\nshort\r\n\r\n")
      .getBytes("US-ASCII")
    intercept[IllegalArgumentException](WarcIngest.parseRecord(lying))
  }

  test("shard framing: GZIPInputStream walks our concatenated members to the same bytes") {
    val docs = Seq(1L -> "first doc", 2L -> "second doc body", 6L -> "third")
    val shard = WarcIngest.shard(docs)
    // JDK reader: concatenated members decode to concatenated records
    val jdk = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(shard)).readAllBytes()
    val want = docs.flatMap { case (id, t) => WarcIngest.record(id, t) }
    assert(jdk.toSeq == want)
    // own walk: one record per member, order preserved
    val members = GzipIngest.gunzipMembers(shard)
    assert(members.length == docs.length)
    members.zip(docs).foreach { case ((raw, _), (id, t)) =>
      val rec = WarcIngest.parseRecord(raw)
      assert(WarcIngest.docIdOf(rec) == id)
      assert(new String(rec.payload, "UTF-8") == t)
    }
  }

  test("a corrupted member mid-shard fails loudly (per-member CRC)") {
    val shard = WarcIngest.shard(Seq(1L -> "aaaa", 2L -> "bbbb"))
    // find the second member's magic; the 8 bytes before it are the
    // FIRST member's CRC32+ISIZE trailer — flip a CRC bit there
    var i = 18
    while (!(shard(i) == 0x1f.toByte && shard(i + 1) == 0x8b.toByte)) i += 1
    val bad = shard.clone()
    bad(i - 6) = (bad(i - 6) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](GzipIngest.gunzipMembers(bad))
    assert(e.getMessage.contains("CRC32 mismatch"))
  }

  test("q200 output matches a driver-side shard+parse recompute") {
    val got = ops.CoreOps.warcIngest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getString(4))).toSeq
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = docs
      .groupBy(_._1 % WarcIngest.NShards).toSeq
      .flatMap { case (sh, ds) =>
        ds.sortBy(_._1).zipWithIndex.map { case ((id, text), i) =>
          val hash = md.digest(text.getBytes("UTF-8"))
            .map(b => f"${b & 0xff}%02x").mkString
          (id, sh, i + 1L, text.length.toLong, hash)
        }
      }.sortBy(_._1)
    assert(got == want)
  }
}
