package graft.sources

/** WARC web-archive ingestion (q200) — the format crawl-scale text
  * corpora are actually distributed in: a shard is a sequence of gzip
  * members, ONE WARC RECORD PER MEMBER, members concatenated back to
  * back (so a reader can seek to any record boundary and inflate just
  * that record — the property that makes the layout work at archive
  * scale). Each response record is a WARC/1.0 header block
  * (name: value lines, Content-Length giving the exact payload size),
  * a blank line, an HTTP/1.1 response (status line + headers + blank
  * line + body), and a CRLF CRLF record separator.
  *
  * The read path composes two own decoders: [[GzipIngest
  * .gunzipMembers]] walks the concatenated members (own DEFLATE
  * end-to-end, CRC-verified per member), and [[parseRecord]] here
  * walks the WARC header block (case-insensitive names, unknown
  * headers skipped, Content-Length-driven payload slicing — the
  * payload is never scanned for separators, so bodies containing
  * header-like bytes cannot confuse the walk) and strips the HTTP
  * envelope. No JDK WARC reader exists; the guards are the q197
  * discipline — golden record bytes assembled longhand in WarcSpec, a
  * hand-authored foreign-flavor record (different casing, extra
  * headers, chunked separators), GZIPInputStream cross-validating the
  * member concatenation (the JDK reader transparently walks
  * concatenated members), and the md5-vs-source oracle proving exact
  * payload recovery.
  */
object WarcIngest {

  /** Shard count — records land in shard doc_id % NShards, ordered by
    * doc_id within the shard (the deterministic bin-packing the oracle
    * reproduces with a row_number).
    */
  val NShards = 16

  /** Deflate level cycles across shards so the member walk sees
    * stored, fixed and dynamic blocks (the q196 discipline).
    */
  def levelFor(id: Long): Int = GzipIngest.levelFor(id)

  /** One WARC response record for doc `id` (uncompressed bytes). */
  def record(id: Long, text: String): Array[Byte] = {
    val body = text.getBytes("UTF-8")
    val http = (s"HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes("US-ASCII") ++ body
    val hdr = (s"WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:doc-$id>\r\n" +
      s"WARC-Target-URI: http://corpus.example/doc/$id\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n" +
      "\r\n").getBytes("US-ASCII")
    hdr ++ http ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  /** One shard: each (id, text) record gzipped as its OWN member, the
    * members concatenated in input order.
    */
  def shard(docs: Seq[(Long, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    docs.foreach { case (id, text) =>
      out.write(GzipIngest.gzip(record(id, text), levelFor(id), s"rec-$id"))
    }
    out.toByteArray
  }

  /** Parsed record: (warc headers lowercased, payload bytes — the HTTP
    * body with both envelopes stripped).
    */
  final case class WarcRecord(headers: Map[String, String], payload: Array[Byte])

  /** Parse ONE uncompressed record (the bytes of one member). */
  def parseRecord(bytes: Array[Byte]): WarcRecord = {
    var pos = 0
    def line(): String = {
      val start = pos
      while (!(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      val s = new String(bytes, start, pos - start, "US-ASCII")
      pos += 2
      s
    }
    val version = line()
    require(version.startsWith("WARC/"), s"not a WARC record: '$version'")
    val headers = Iterator.continually(line()).takeWhile(_.nonEmpty).map { l =>
      val i = l.indexOf(':')
      require(i > 0, s"malformed WARC header '$l'")
      l.substring(0, i).toLowerCase -> l.substring(i + 1).trim
    }.toMap
    val len = headers.getOrElse("content-length",
      throw new IllegalArgumentException("record has no Content-Length")).toInt
    require(pos + len <= bytes.length, "record payload truncated")
    val block = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
    pos += len
    // record separator: exactly two CRLFs, then end of member
    require(pos + 4 == bytes.length
      && bytes(pos) == '\r' && bytes(pos + 1) == '\n'
      && bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
      "missing CRLF CRLF record separator")
    val payload = headers.get("content-type") match {
      case Some(ct) if ct.startsWith("application/http") => stripHttp(block)
      case _ => block
    }
    WarcRecord(headers, payload)
  }

  /** Drop the HTTP status line + headers; the body is everything after
    * the first blank line (Content-Length inside the HTTP headers is
    * advisory here — the WARC length already bounded the block).
    */
  private def stripHttp(block: Array[Byte]): Array[Byte] = {
    var i = 0
    while (!(block(i) == '\r' && block(i + 1) == '\n'
      && block(i + 2) == '\r' && block(i + 3) == '\n')) i += 1
    java.util.Arrays.copyOfRange(block, i + 4, block.length)
  }

  /** Doc id back out of the Target-URI (the join key to the oracle). */
  def docIdOf(rec: WarcRecord): Long = {
    val uri = rec.headers("warc-target-uri")
    uri.substring(uri.lastIndexOf('/') + 1).toLong
  }
}
