package graft.sources

/** REAL compressed-text ingestion (q196) — the container web-scale
  * corpora actually arrive in: gzip members (RFC 1952) wrapping DEFLATE
  * streams (RFC 1951). Unlike q186's PNG lane (which delegated the
  * bitstream to java.util.zip.Inflater), the decompressor here is OWN
  * code end-to-end: an LSB-first bit reader, canonical-Huffman decoding
  * without trees (count/offset tables per code length), all three
  * DEFLATE block types — stored (00), fixed-Huffman (01) and
  * dynamic-Huffman (10, with the 16/17/18 code-length run alphabet) —
  * and the LZ77 window copy with overlapping back-references. Since the
  * r11 CRC swap the read path is own code WITHOUT EXCEPTION: the
  * CRC-32 that verifies member trailers (and PNG chunks) is the
  * table-driven implementation below, held against java.util.zip.CRC32
  * in InflateSpec — no java.util.zip call remains on any decode path.
  *
  * Two write paths, each for a reason. q196's FIXTURE bitstreams come
  * from java.util.zip.Deflater (we do not control its block-splitting
  * or Huffman choices, so the decoder is honest), levels cycling
  * 0/1/6/9 so stored, fixed and dynamic blocks all occur; only the
  * gzip framing is own ([[gzip]]). q207's SINK is the own encoder the
  * other direction demands: [[deflateFixed]] (greedy LZ77 hash chains,
  * fixed-Huffman emission) inside [[gzipOwn]] — GzipSinkSpec holds
  * every own-encoded member against GZIPInputStream and raw Inflater,
  * the decoders we do not control.
  *
  * Reference behavior: the reference suite ingests its CSV input
  * pre-decompressed (benchmark-pandas-vs-polars-… main.rs:24 reads the
  * plain CSV); a 100 TB corpus never ships uncompressed, so this lane
  * adds the decompression half the reference leaves to the shell.
  *
  * Throughput (r12 decode + r13 encode, measured —
  * bench_evidence/r12_inflate_throughput.md, r13_encode_throughput
  * .md): after the root-table Huffman decode and the deferred-modulo
  * Adler-32 / sliced CRC-32, every decode shape is within 1.5× of the
  * JDK's NATIVE zlib, and the shape that dominates corpus ingest
  * (per-record gzip members) is ~1.4× FASTER than GZIPInputStream —
  * own code stays on every decode path on merit, not just ownership.
  * The ENCODE side closed its r12 carve-out in r13: the 0.37×-of-
  * native reading was NOT the greedy fixed-Huffman algorithm — it was
  * a fresh 128 KiB hash-head array allocated and filled PER DOCUMENT
  * (plus bit-at-a-time Huffman emission); with the generation-stamped
  * thread-local head table and pre-reversed code tables, per-doc
  * encode (the shape q207/q208 write) runs ~2.5× FASTER than
  * Deflater-6 — ratio stays the greedy/fixed trade, speed does not.
  */
object GzipIngest {

  /** Per-member block-type counters (stored/fixed/dynamic) so specs can
    * prove which DEFLATE paths a corpus actually exercised.
    */
  final case class BlockStats(stored: Int, fixedH: Int, dynamicH: Int)

  // ---- RFC 1951 constants ----
  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
    23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
    2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
    97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
    6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
    3, 13, 2, 14, 1, 15)

  /** Canonical Huffman decoder built from code LENGTHS alone (the only
    * thing the bitstream carries): count[len] + symbols sorted by
    * (len, symbol). Decode walks bit-by-bit — codes are ≤ 15 bits, so
    * the walk is bounded and allocation-free.
    */
  private final class Huffman(lengths: Array[Int],
                              allowEmpty: Boolean = false) {
    val count = new Array[Int](16)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    // RFC 1951 §3.2.7 permits HDIST=1 with one zero-length code —
    // "no distance codes": the table may be empty for the DISTANCE
    // alphabet (any attempt to decode a symbol from it then fails in
    // BitReader.decode, matching zlib). Literal/code-length alphabets
    // must be non-empty. (r11 ADVICE: JDK fixtures never emit this but
    // foreign encoders in real gzip/WARC corpora can.)
    require(allowEmpty || count.sum > 0, "empty Huffman code")
    val symbols = new Array[Int](count.sum)
    val offs = new Array[Int](16)
    (1 until 15).foreach(l => offs(l + 1) = offs(l) + count(l))
    private val fill = offs.clone()
    lengths.indices.foreach { sym =>
      val l = lengths(sym)
      if (l > 0) { symbols(fill(l)) = sym; fill(l) += 1 }
    }
    // over-subscribed codes would make decode ambiguous; incomplete
    // codes are legal (single-symbol distance trees occur in practice)
    locally {
      var left = 1
      (1 to 15).foreach { l => left <<= 1; left -= count(l)
        require(left >= 0, s"over-subscribed Huffman code at length $l") }
    }
    // ---- root lookup table (zlib's structure): peek rootBits LSB-first
    // bits, index directly to (len, symbol) for every code ≤ rootBits
    // long; longer codes (rare: zlib caps the root at 9 bits for the
    // same reason) mark -1 and fall back to the bit-walk. This is what
    // took the own inflate from 0.26x of the JDK's native zlib to
    // parity-class throughput (bench_evidence/r12_inflate_throughput.md)
    // without surrendering the own-code decode path. ----
    val rootBits: Int = {
      var m = 0
      lengths.foreach(l => if (l > m) m = l)
      math.max(1, math.min(9, m))
    }
    /** Canonical first code per length (code = (code+count(l-1))<<1) —
      * lets the long-code path RESUME the walk at rootBits+1 instead of
      * re-deriving the first rootBits levels bit-by-bit.
      */
    val firstCode: Array[Int] = {
      val f = new Array[Int](16)
      var code = 0
      (1 to 15).foreach { l => code = (code + count(l - 1)) << 1; f(l) = code }
      f
    }
    val table: Array[Int] = {
      val t = Array.fill(1 << rootBits)(-1)
      // canonical first-code per length: code = (code + count(l-1)) << 1
      var code = 0
      var l = 1
      while (l <= rootBits) {
        code = (code + (if (l >= 2) count(l - 1) else 0)) << 1
        var k = 0
        val base = offs(l)
        while (k < count(l)) {
          // codes are MSB-first in the bitstream but the reader is
          // LSB-first: the table index is the bit-reversed code
          var c = code + k
          var rc = 0
          var b = 0
          while (b < l) { rc = (rc << 1) | (c & 1); c >>= 1; b += 1 }
          var idx = rc
          val entry = (l << 16) | symbols(base + k)
          while (idx < t.length) { t(idx) = entry; idx += (1 << l) }
          k += 1
        }
        l += 1
      }
      t
    }
  }

  /** LSB-first bit reader over the member's compressed body. The
    * buffer is 64-bit so the common refill loads FOUR bytes in one
    * bounds check (the per-byte refill was the hot path's bottleneck —
    * bench_evidence/r12_inflate_throughput.md); near the end of the
    * data it degrades to the per-byte loop.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var bitBuf = 0L
    private var bitCnt = 0
    private def refill(n: Int): Unit = {
      if (bitCnt < n) {
        if (bitCnt <= 32 && pos + 4 <= data.length) {
          bitBuf |= ((data(pos) & 0xffL) | ((data(pos + 1) & 0xffL) << 8) |
            ((data(pos + 2) & 0xffL) << 16) |
            ((data(pos + 3) & 0xffL) << 24)) << bitCnt
          pos += 4; bitCnt += 32
        } else {
          while (bitCnt < n && pos < data.length) {
            bitBuf |= (data(pos) & 0xffL) << bitCnt
            pos += 1; bitCnt += 8
          }
        }
      }
    }
    def bits(n: Int): Int = {
      refill(n)
      require(bitCnt >= n, "DEFLATE stream truncated")
      val v = (bitBuf & ((1L << n) - 1)).toInt
      bitBuf >>>= n; bitCnt -= n
      v
    }
    /** Non-consuming read of up to `n` bits; bits past the end of the
      * data arrive as zeros (a valid stream never DECODES into them —
      * `drop` still enforces that consumed bits existed).
      */
    def peek(n: Int): Int = {
      refill(n)
      (bitBuf & ((1L << n) - 1)).toInt
    }
    def drop(n: Int): Unit = {
      require(bitCnt >= n, "DEFLATE stream truncated")
      bitBuf >>>= n; bitCnt -= n
    }
    /** Byte offset of the first byte NOT consumed by decoded bits:
      * `pos` may have run ahead via peek pre-buffering, so whole
      * unconsumed buffered bytes are handed back; sub-byte leftovers
      * are the final byte's padding bits.
      */
    def bytePos: Int = pos - bitCnt / 8
    def decode(h: Huffman): Int = {
      // fast path: one root-table lookup resolves every code ≤ rootBits
      val rb = h.rootBits
      val idx = peek(rb)
      val e = h.table(idx)
      if (e >= 0) { drop(e >>> 16); return e & 0xffff }
      // long-code path: the peeked rootBits bits are by construction a
      // strict prefix of the code — consume them and RESUME the
      // canonical walk at rootBits+1 (firstCode/offs carry the state
      // the old from-scratch bit-walk re-derived every time)
      drop(rb)
      var code = Integer.reverse(idx) >>> (32 - rb) // MSB-first prefix
      var len = rb + 1
      while (len <= 15) {
        code = (code << 1) | bits(1)
        if (code - h.firstCode(len) < h.count(len))
          return h.symbols(h.offs(len) + (code - h.firstCode(len)))
        len += 1
      }
      throw new IllegalArgumentException("invalid Huffman code in stream")
    }
    def alignByte(): Unit = {
      pos -= bitCnt / 8 // hand back peek-buffered whole bytes first
      bitBuf = 0; bitCnt = 0
    }
  }

  private val FixedLit: Huffman = new Huffman(
    Array.tabulate(288)(i =>
      if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8))
  private val FixedDist: Huffman = new Huffman(Array.fill(30)(5))

  /** Inflate one DEFLATE stream starting at `data(start)`. Returns the
    * raw bytes, the position AFTER the stream (the trailer starts
    * there) and per-block-type stats. Window copies run byte-by-byte so
    * overlapping back-references (dist < len — the run-length idiom)
    * are reproduced exactly as RFC 1951 §3.2.3 requires.
    */
  def inflate(data: Array[Byte], start: Int): (Array[Byte], Int, BlockStats) = {
    val br = new BitReader(data, start)
    var out = new Array[Byte](8192)
    var outN = 0
    def ensure(extra: Int): Unit =
      if (outN + extra > out.length) {
        var cap = out.length * 2
        while (cap < outN + extra) cap *= 2
        out = java.util.Arrays.copyOf(out, cap)
      }
    var stored = 0; var fixedB = 0; var dyn = 0
    var bfinal = 0
    do {
      bfinal = br.bits(1)
      br.bits(2) match {
        case 0 => // stored: byte-aligned LEN/~LEN then raw copy
          stored += 1
          br.alignByte()
          require(br.pos + 4 <= data.length, "stored block truncated")
          def u16(i: Int) = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8)
          val len = u16(br.pos); val nlen = u16(br.pos + 2)
          require((len ^ 0xffff) == nlen, "stored block LEN/NLEN mismatch")
          br.pos += 4
          require(br.pos + len <= data.length, "stored block truncated")
          ensure(len)
          System.arraycopy(data, br.pos, out, outN, len)
          br.pos += len; outN += len
        case btype @ (1 | 2) =>
          val (lit, dist) =
            if (btype == 1) { fixedB += 1; (FixedLit, FixedDist) }
            else {
              dyn += 1
              val hlit = br.bits(5) + 257
              val hdist = br.bits(5) + 1
              val hclen = br.bits(4) + 4
              val clLens = new Array[Int](19)
              (0 until hclen).foreach(i => clLens(ClOrder(i)) = br.bits(3))
              val clTree = new Huffman(clLens)
              val lens = new Array[Int](hlit + hdist)
              var i = 0
              while (i < lens.length) {
                br.decode(clTree) match {
                  case s if s < 16 => lens(i) = s; i += 1
                  case 16 =>
                    require(i > 0, "repeat with no previous length")
                    val r = 3 + br.bits(2)
                    (0 until r).foreach { _ => lens(i) = lens(i - 1); i += 1 }
                  case 17 => i += 3 + br.bits(3)
                  case 18 => i += 11 + br.bits(7)
                }
              }
              require(i == lens.length, "code-length run overflowed the table")
              require(lens(256) > 0, "dynamic block has no end-of-block code")
              (new Huffman(lens.take(hlit)),
               new Huffman(lens.drop(hlit), allowEmpty = true))
            }
          var sym = br.decode(lit)
          while (sym != 256) {
            if (sym < 256) { ensure(1); out(outN) = sym.toByte; outN += 1 }
            else {
              require(sym <= 285, s"invalid length symbol $sym")
              val li = sym - 257
              val len = LenBase(li) + br.bits(LenExtra(li))
              val ds = br.decode(dist)
              require(ds < 30, s"invalid distance symbol $ds")
              val d = DistBase(ds) + br.bits(DistExtra(ds))
              require(d <= outN, s"back-reference $d beyond output $outN")
              ensure(len)
              if (d >= len) {
                // non-overlapping: bulk copy (the common case)
                System.arraycopy(out, outN - d, out, outN, len)
                outN += len
              } else {
                // overlapping run-length idiom: byte-by-byte, exactly
                // as RFC 1951 §3.2.3 requires
                var k = 0
                while (k < len) { out(outN) = out(outN - d); outN += 1; k += 1 }
              }
            }
            sym = br.decode(lit)
          }
        case bt => throw new IllegalArgumentException(s"reserved BTYPE $bt")
      }
    } while (bfinal == 0)
    (java.util.Arrays.copyOf(out, outN), br.bytePos,
      BlockStats(stored, fixedB, dyn))
  }

  // ---- own DEFLATE ENCODER (q207's sink half) ----

  /** LSB-first bit writer; Huffman codes go MSB-of-code-first per
    * RFC 1951 §3.1.1 — [[huff]] therefore emits the BIT-REVERSED code
    * in one [[bits]] call (r13 encode-throughput fix: the first cut
    * looped one bits(…,1) call per code bit through a
    * ByteArrayOutputStream — 8-9 calls per literal was most of the
    * 0.37x encode gap). A 64-bit accumulator over a raw growable
    * array flushes whole bytes; the emitted stream is byte-identical.
    */
  private final class BitWriter(cap: Int) {
    private var arr = new Array[Byte](math.max(64, cap))
    private var n = 0
    private var acc = 0L
    private var cnt = 0
    def bits(v: Int, nb: Int): Unit = {
      acc |= (v.toLong & ((1L << nb) - 1)) << cnt
      cnt += nb
      while (cnt >= 8) {
        if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
        arr(n) = (acc & 0xff).toByte; n += 1
        acc >>>= 8; cnt -= 8
      }
    }
    def huff(code: Int, nb: Int): Unit = bits(revBits(code, nb), nb)
    def finish(): Array[Byte] = {
      if (cnt > 0) {
        if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length + 1)
        arr(n) = (acc & 0xff).toByte; n += 1
      }
      java.util.Arrays.copyOf(arr, n)
    }
  }

  /** Reverse the low `n` bits of `v` (MSB-first code -> LSB-first
    * stream order).
    */
  private def revBits(v: Int, n: Int): Int = {
    var r = 0; var x = v; var i = 0
    while (i < n) { r = (r << 1) | (x & 1); x >>= 1; i += 1 }
    r
  }

  /** Pre-reversed fixed-table literal/length codes (symbol -> stream-
    * order code + length) and 5-bit distance codes — one table lookup
    * + one bits() call per symbol.
    */
  private val FixedLitRev: Array[Int] = Array.tabulate(286) { sym =>
    val (c, n) = fixedLitCode(sym); revBits(c, n)
  }
  private val FixedLitBits: Array[Int] = Array.tabulate(286) { sym =>
    fixedLitCode(sym)._2
  }
  private val FixedDistRev: Array[Int] = Array.tabulate(30)(d => revBits(d, 5))

  /** Fixed-table code for a literal/length symbol (RFC 1951 §3.2.6). */
  private def fixedLitCode(sym: Int): (Int, Int) =
    if (sym < 144) (0x30 + sym, 8)
    else if (sym < 256) (0x190 + (sym - 144), 9)
    else if (sym < 280) (sym - 256, 7)
    else (0xc0 + (sym - 280), 8)

  /** Length 3..258 -> index into LenBase (largest base <= len). */
  private val LenCodeOf: Array[Int] = {
    // largest base <= len; code 284 (base 227) covers 227..257 via its
    // 5 extra bits, and 258 lands exactly on code 285 (base 258)
    val a = new Array[Int](259)
    var li = 0
    (3 to 258).foreach { l =>
      while (li + 1 < LenBase.length && LenBase(li + 1) <= l) li += 1
      a(l) = li
    }
    a
  }

  private def distCodeOf(d: Int): Int = {
    var i = DistBase.length - 1
    while (DistBase(i) > d) i -= 1
    i
  }

  /** Own DEFLATE compressor: greedy LZ77 over hash chains (3-byte
    * hash, 32 KiB window, matches 3..258, bounded chain walk) emitted
    * under the FIXED Huffman tables in one final block. Not Deflater's
    * equal on ratio (no lazy matching, no dynamic trees) — but a real
    * compressor whose output any conformant inflater must accept;
    * InflateSpec holds it against GZIPInputStream/Inflater, the
    * decoders we do NOT control.
    */
  /** Per-thread hash-head table with generation stamping: a fresh
    * 2^15-int head array PER CALL (the first cut's Array.fill) cost
    * 128 KiB of allocate+fill per document — on the ~300 B docs the
    * q207/q208 sinks actually write, that WAS the encoder (r13 encode
    * forensics). A slot is live iff its stamp equals this call's
    * generation, so reuse needs no clearing; match behavior is
    * bit-identical to the fresh-array version.
    */
  private final class DeflateState {
    val head = new Array[Int](1 << 15)
    val stamp = new Array[Int](1 << 15)
    var gen = 0
  }
  private val dfState =
    ThreadLocal.withInitial[DeflateState](() => new DeflateState)

  def deflateFixed(raw: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter(raw.length / 2 + 64)
    bw.bits(1, 1) // BFINAL: single block
    bw.bits(1, 2) // BTYPE 01: fixed Huffman
    val HashBits = 15
    val st = dfState.get()
    if (st.gen == Int.MaxValue) {
      java.util.Arrays.fill(st.stamp, 0); st.gen = 0
    }
    st.gen += 1
    val g = st.gen
    val head = st.head
    val stamp = st.stamp
    val prev = new Array[Int](raw.length)
    def h3(i: Int): Int =
      (((raw(i) & 0xff) << 10) ^ ((raw(i + 1) & 0xff) << 5) ^
        (raw(i + 2) & 0xff)) & ((1 << HashBits) - 1)
    def headAt(h: Int): Int = if (stamp(h) == g) head(h) else -1
    def insert(i: Int): Unit =
      if (i + 3 <= raw.length) {
        val h = h3(i)
        prev(i) = headAt(h); head(h) = i; stamp(h) = g
      }
    def emitLen(len: Int): Unit = {
      val li = LenCodeOf(len)
      bw.bits(FixedLitRev(257 + li), FixedLitBits(257 + li))
      if (LenExtra(li) > 0) bw.bits(len - LenBase(li), LenExtra(li))
    }
    def emitDist(d: Int): Unit = {
      val di = distCodeOf(d)
      bw.bits(FixedDistRev(di), 5)
      if (DistExtra(di) > 0) bw.bits(d - DistBase(di), DistExtra(di))
    }
    var i = 0
    while (i < raw.length) {
      var bestLen = 0
      var bestDist = 0
      if (i + 3 <= raw.length) {
        var cand = headAt(h3(i))
        var chain = 0
        val max = math.min(258, raw.length - i)
        // zlib's two chain-walk cuts (they change which match WINS, not
        // validity — specs pin decoded content, never encoded bytes):
        // screen each candidate by the single byte a longer-than-best
        // match must share before paying a full compare, and stop the
        // walk once a "nice" match is in hand
        while (cand >= 0 && chain < 64 && i - cand <= 32768 && bestLen < 64) {
          if (bestLen == 0 ||
              (bestLen < max && raw(cand + bestLen) == raw(i + bestLen))) {
            var l = 0
            while (l < max && raw(cand + l) == raw(i + l)) l += 1
            if (l >= 3 && l > bestLen) { bestLen = l; bestDist = i - cand }
          }
          cand = prev(cand)
          chain += 1
        }
      }
      if (bestLen >= 3) {
        emitLen(bestLen); emitDist(bestDist)
        var k = 0
        while (k < bestLen) { insert(i + k); k += 1 }
        i += bestLen
      } else {
        val s = raw(i) & 0xff
        bw.bits(FixedLitRev(s), FixedLitBits(s))
        insert(i)
        i += 1
      }
    }
    bw.bits(FixedLitRev(256), FixedLitBits(256)) // end of block
    bw.finish()
  }

  /** One gzip member written ENTIRELY by own code: own framing around
    * the own fixed-Huffman DEFLATE stream, own CRC-32 + ISIZE trailer.
    */
  def gzipOwn(raw: Array[Byte], name: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    out.write(0x1f); out.write(0x8b); out.write(8); out.write(FNAME)
    out.write(0); out.write(0); out.write(0); out.write(0) // MTIME=0
    out.write(0); out.write(255)
    name.getBytes("US-ASCII").foreach(b => out.write(b & 0xff))
    out.write(0)
    val body = deflateFixed(raw)
    out.write(body, 0, body.length)
    val c = crc32(raw); val n = raw.length.toLong
    Seq(c, c >> 8, c >> 16, c >> 24, n, n >> 8, n >> 16, n >> 24)
      .foreach(v => out.write((v & 0xff).toInt))
    out.toByteArray
  }

  // ---- RFC 1952 member framing ----
  private val FTEXT = 1; private val FHCRC = 2; private val FEXTRA = 4
  private val FNAME = 8; private val FCOMMENT = 16

  /** Parse ONE gzip member: header (magic, CM=8, all five optional
    * fields honored), own-inflate body, then VERIFY the CRC32 + ISIZE
    * trailer — a decoder that skips trailer verification would pass
    * every test until the first corrupted corpus shard. Requires the
    * member to span the whole array (the q196 one-file-one-member
    * fixture); multi-member shards go through [[gunzipMembers]].
    */
  def gunzipMember(data: Array[Byte]): (Array[Byte], BlockStats) = {
    val (raw, after, stats) = gunzipMemberAt(data, 0)
    require(after == data.length,
      s"trailing bytes after the gzip member ($after of ${data.length})")
    (raw, stats)
  }

  /** One member starting at `start`; returns (raw, positionAfter,
    * stats) so callers can walk CONCATENATED members — the layout
    * web-archive shards actually use (one member per record, members
    * back to back in the shard file).
    */
  def gunzipMemberAt(data: Array[Byte], start: Int): (Array[Byte], Int, BlockStats) = {
    def u8(i: Int) = data(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    require(data.length - start >= 18, "gzip member too short")
    require(u8(start) == 0x1f && u8(start + 1) == 0x8b, "bad gzip magic")
    require(u8(start + 2) == 8, s"unsupported CM ${u8(start + 2)} (only DEFLATE)")
    val flg = u8(start + 3)
    require((flg & 0xe0) == 0, "reserved FLG bits set")
    var pos = start + 10 // MTIME(4) XFL OS skipped
    if ((flg & FEXTRA) != 0) { pos += 2 + u16(pos) }
    if ((flg & FNAME) != 0) { while (u8(pos) != 0) pos += 1; pos += 1 }
    if ((flg & FCOMMENT) != 0) { while (u8(pos) != 0) pos += 1; pos += 1 }
    if ((flg & FHCRC) != 0) {
      val hc = crc32(data, start, pos - start)
      require((hc & 0xffff).toInt == u16(pos), "header CRC16 mismatch")
      pos += 2
    }
    val (raw, after, stats) = inflate(data, pos)
    require(after + 8 <= data.length, "gzip trailer truncated")
    val c = crc32(raw)
    require(c == u32(after),
      f"CRC32 mismatch: computed $c%08x, trailer ${u32(after)}%08x")
    require((raw.length.toLong & 0xffffffffL) == u32(after + 4),
      s"ISIZE mismatch: ${raw.length} vs ${u32(after + 4)}")
    (raw, after + 8, stats)
  }

  /** Own table-driven CRC-32 (reflected poly 0xEDB88320 — the
    * ISO 3309 / gzip / PNG checksum), retiring the last java.util.zip
    * dependency from every decode path. Held against the JDK's CRC32
    * in InflateSpec.
    */
  private val CrcTable: Array[Int] = Array.tabulate(256) { n =>
    var c = n
    var k = 0
    while (k < 8) { c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1; k += 1 }
    c
  }

  // slicing-by-4 companion tables (Tk(b) = crc of byte b followed by k
  // zero bytes): four table lookups retire FOUR input bytes per
  // iteration instead of one — the classic public crc speedup; the
  // one-byte loop handles the unaligned head/tail. Differential
  // equality with java.util.zip.CRC32 is already pinned in InflateSpec.
  private val CrcT1: Array[Int] =
    Array.tabulate(256)(n => CrcTable(CrcTable(n) & 0xff) ^ (CrcTable(n) >>> 8))
  private val CrcT2: Array[Int] =
    Array.tabulate(256)(n => CrcTable(CrcT1(n) & 0xff) ^ (CrcT1(n) >>> 8))
  private val CrcT3: Array[Int] =
    Array.tabulate(256)(n => CrcTable(CrcT2(n) & 0xff) ^ (CrcT2(n) >>> 8))

  def crc32(data: Array[Byte], off: Int, len: Int): Long = {
    var c = 0xffffffff
    var i = off
    val end = off + len
    val end4 = off + (len & ~3)
    while (i < end4) {
      c ^= (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      c = CrcT3(c & 0xff) ^ CrcT2((c >>> 8) & 0xff) ^
        CrcT1((c >>> 16) & 0xff) ^ CrcTable(c >>> 24)
      i += 4
    }
    while (i < end) {
      c = CrcTable((c ^ data(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    (~c).toLong & 0xffffffffL
  }

  def crc32(data: Array[Byte]): Long = crc32(data, 0, data.length)

  /** Own Adler-32 (RFC 1950 §8) — the zlib trailer checksum. The
    * modulo is DEFERRED (zlib's NMAX idea): with Long accumulators a
    * 64 KiB run cannot overflow (a ≤ 65520 + 255·65536 ≈ 2^24,
    * b ≤ 65536·a ≈ 2^40), so the per-byte loop is two adds — the naive
    * two-modulos-per-byte form alone throttled unzlib to ~130 MB/s
    * (bench_evidence/r12_inflate_throughput.md).
    */
  def adler32(data: Array[Byte]): Long = {
    var a = 1L; var b = 0L
    var i = 0
    while (i < data.length) {
      val end = math.min(i + 65536, data.length)
      while (i < end) {
        a += data(i) & 0xff
        b += a
        i += 1
      }
      a %= 65521; b %= 65521
    }
    (b << 16) | a
  }

  /** Parse ONE zlib stream (RFC 1950 — the framing PNG IDAT uses):
    * CMF/FLG validation (CM=8, header check bits, no preset dict),
    * own inflate, own Adler-32 trailer verification. With this, the
    * PNG lane's decompression is own code end to end (q186 delegated
    * the bitstream to Inflater before q196's decoder existed).
    */
  def unzlib(data: Array[Byte]): (Array[Byte], BlockStats) = {
    require(data.length >= 6, "zlib stream too short")
    val cmf = data(0) & 0xff
    val flg = data(1) & 0xff
    require((cmf & 0x0f) == 8, s"zlib CM ${cmf & 0x0f} unsupported")
    require((cmf * 256 + flg) % 31 == 0, "zlib header check bits invalid")
    require((flg & 0x20) == 0, "preset dictionary unsupported")
    val (raw, after, stats) = inflate(data, 2)
    require(after + 4 <= data.length, "zlib trailer truncated")
    def u8(i: Int) = data(i) & 0xff
    val want = (u8(after).toLong << 24) | (u8(after + 1).toLong << 16) |
      (u8(after + 2).toLong << 8) | u8(after + 3)
    require(adler32(raw) == want,
      f"Adler-32 mismatch: computed ${adler32(raw)}%08x, trailer $want%08x")
    (raw, stats)
  }

  /** Walk every member of a concatenated-member shard. */
  def gunzipMembers(data: Array[Byte]): Seq[(Array[Byte], BlockStats)] = {
    val out = Seq.newBuilder[(Array[Byte], BlockStats)]
    var pos = 0
    while (pos < data.length) {
      val (raw, next, stats) = gunzipMemberAt(data, pos)
      out += ((raw, stats))
      pos = next
    }
    out.result()
  }

  /** Deflate level for doc `id` — cycles 0/1/6/9 so the staged corpus
    * contains stored (level 0), fixed-Huffman (small/low-entropy
    * payloads) and dynamic-Huffman blocks.
    */
  def levelFor(id: Long): Int = (id % 4) match {
    case 0 => 0; case 1 => 1; case 2 => 6; case _ => 9
  }

  /** Write one gzip member: own framing (magic, FNAME with the doc id —
    * exercising the variable-length header walk on every fixture row),
    * JDK Deflater bitstream (nowrap — the raw RFC 1951 stream), own
    * CRC32 + ISIZE trailer. InflateSpec feeds these same members to
    * GZIPInputStream to cross-validate the framing.
    */
  def gzip(raw: Array[Byte], level: Int, name: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    out.write(0x1f); out.write(0x8b); out.write(8); out.write(FNAME)
    out.write(0); out.write(0); out.write(0); out.write(0) // MTIME=0
    out.write(if (level == 9) 2 else if (level <= 1) 4 else 0) // XFL
    out.write(255) // OS unknown
    name.getBytes("US-ASCII").foreach(b => out.write(b & 0xff))
    out.write(0)
    val d = new java.util.zip.Deflater(level, true)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val c = crc32(raw); val n = raw.length.toLong
    Seq(c, c >> 8, c >> 16, c >> 24, n, n >> 8, n >> 16, n >> 24)
      .foreach(v => out.write((v & 0xff).toInt))
    out.toByteArray
  }
}
