package graft.sources

/** POSIX ustar archive walk (q208) — the third archive discipline the
  * corpus world ships in (after q196's gzip members and q200's WARC
  * records): fixed 512-byte blocks, octal-encoded sizes, a spaces-for-
  * checksum header checksum, zero-padded payloads and a two-zero-block
  * terminator. Combined with [[GzipIngest.gzipOwn]] the engine both
  * WRITES and READS `.tgz` shards entirely with own code.
  *
  * Honesty caveat (the q197 discipline): the JDK has no tar codec, so
  * writer and parser are both own code — guarded by golden archive
  * bytes assembled longhand in TarSpec, a checksum that provably fires
  * on corruption, and the md5-vs-source oracle proving exact content
  * recovery through the gzip + tar layers.
  */
object TarIngest {

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (the POSIX form)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes("US-ASCII")
  }

  /** One ustar file entry: 512-byte header + zero-padded data blocks. */
  def entry(name: String, data: Array[Byte]): Array[Byte] = {
    require(name.length < 100, "name field is 100 bytes")
    val hdr = new Array[Byte](512)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, hdr, off, bytes.length)
    put(0, name.getBytes("US-ASCII"))
    put(100, octal(420, 8)) // mode 0644
    put(108, octal(0, 8)) // uid
    put(116, octal(0, 8)) // gid
    put(124, octal(data.length.toLong, 12))
    put(136, octal(0, 12)) // mtime
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum as spaces
    hdr(156) = '0' // typeflag: regular file
    put(257, "ustar\u000000".getBytes("US-ASCII")) // magic + version
    val sum = hdr.map(_ & 0xff).sum
    // checksum: 6 octal digits, NUL, space (the historical layout)
    val cs = java.lang.Long.toOctalString(sum.toLong)
    put(148, (("0" * (6 - cs.length)) + cs + "\u0000 ").getBytes("US-ASCII"))
    val nBlocks = (data.length + 511) / 512
    val out = new Array[Byte](512 + nBlocks * 512)
    System.arraycopy(hdr, 0, out, 0, 512)
    System.arraycopy(data, 0, out, 512, data.length)
    out
  }

  /** A full archive: entries back to back + the two-zero-block end. */
  def archive(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    files.foreach { case (n, d) => val e = entry(n, d); out.write(e, 0, e.length) }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Walk an archive: per entry verify the header checksum (spaces
    * substituted back in), parse the octal size, slice the payload,
    * skip the zero padding; stop at the first zero block. Returns the
    * (name, content) pairs in archive order.
    */
  def parse(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var pos = 0
    var done = false
    while (!done) {
      require(pos + 512 <= bytes.length, "archive truncated mid-header")
      if ((0 until 512).forall(i => bytes(pos + i) == 0)) done = true
      else {
        var sum = 0L
        (0 until 512).foreach { i =>
          sum += (if (i >= 148 && i < 156) ' '.toInt
                  else bytes(pos + i) & 0xff)
        }
        // numeric/checksum fields terminate at NUL OR space (octal
        // values are space- or NUL-padded per POSIX); string fields
        // (name, magic) terminate at NUL ONLY — spaces are valid in
        // ustar names, so space-terminating them would silently
        // truncate "my file.txt" to "my" (r11 ADVICE).
        def field(off: Int, len: Int): String = {
          var end = off
          while (end < off + len && bytes(pos + end) != 0
            && bytes(pos + end) != ' ') end += 1
          new String(bytes, pos + off, end - off, "US-ASCII")
        }
        def strField(off: Int, len: Int): String = {
          var end = off
          while (end < off + len && bytes(pos + end) != 0) end += 1
          new String(bytes, pos + off, end - off, "US-ASCII")
        }
        val stored = java.lang.Long.parseLong(field(148, 8), 8)
        require(stored == sum,
          s"tar header checksum mismatch: stored $stored, computed $sum")
        // POSIX writes magic "ustar\0"; GNU's old format writes
        // "ustar  \0" (space-padded) — accept both spellings
        require(strField(257, 6).trim == "ustar", "not a ustar header")
        val name = strField(0, 100)
        val size = java.lang.Long.parseLong(field(124, 12), 8).toInt
        require(pos + 512 + size <= bytes.length, "entry payload truncated")
        out += ((name,
          java.util.Arrays.copyOfRange(bytes, pos + 512, pos + 512 + size)))
        pos += 512 + ((size + 511) / 512) * 512
      }
    }
    out.result()
  }
}
