package graft

import graft.sources.GzipIngest

/** Dev harness pricing the own-DEFLATE decode paths against the JDK's
  * native zlib (r11 verdict "what's wrong" #3: the own inflate is
  * differentially PROVEN correct, but at 100 TB ingest decode
  * throughput IS the job, and the trade was never measured).
  *
  * Three workloads, matching the three production decode sites:
  *  - q196-shape: one gzip member per document (Deflater levels
  *    cycling 0/1/6/9 — stored, fixed and dynamic blocks all occur),
  *    own [[GzipIngest.gunzipMember]] vs GZIPInputStream.
  *  - q200-shape: concatenated members per 16-doc shard, own
  *    [[GzipIngest.gunzipMembers]] vs a GZIPInputStream loop
  *    (transparent concatenated-member walk).
  *  - q186-shape: one large zlib stream (the PNG IDAT framing) over
  *    the whole corpus, own [[GzipIngest.unzlib]] vs Inflater.
  *
  * Throughput = UNCOMPRESSED MB/s, median of `reps` timed passes after
  * one warm-up (JIT). Encode side is priced too (own deflateFixed vs
  * Deflater-6) since q207/q208 write through it.
  *
  * Usage: runMain graft.DevInflateBench <sfDir> [reps]
  */
object DevInflateBench {

  private def timeMedian(reps: Int)(body: => Long): (Double, Long) = {
    body // warm-up
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val bytes = body
      ((System.nanoTime() - t0) / 1e9, bytes)
    }
    val sorted = times.map(_._1).sorted
    (sorted(sorted.length / 2), times.head._2)
  }

  private def mbs(bytes: Long, sec: Double): Double = bytes / 1e6 / sec

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val spark = Sessions.benchSession("graft-inflatebench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val amp = if (args.length > 2) args(2).toInt else 8
    val base: Array[(Long, Array[Byte])] =
      Tables.documents(spark, sfDir)
        .select("doc_id", "text").as[(Long, String)]
        .collect().map { case (id, t) => (id, t.getBytes("UTF-8")) }
    spark.stop()
    // amplify so each timed pass runs long enough to dominate timer
    // noise (ids offset so levelFor still cycles)
    val docs: Array[(Long, Array[Byte])] =
      (0 until amp).flatMap(a =>
        base.map { case (id, b) => (id + a, b) }).toArray
    val rawTotal = docs.map(_._2.length.toLong).sum
    println(f"[inflatebench] corpus: ${docs.length} docs, ${rawTotal / 1e6}%.1f MB raw")

    // ---- q196-shape: per-doc members, levels cycling 0/1/6/9 ----
    val members = docs.map { case (id, raw) =>
      GzipIngest.gzip(raw, GzipIngest.levelFor(id), s"doc_$id.txt")
    }
    val (ownM, _) = timeMedian(reps) {
      var n = 0L
      members.foreach { gz => n += GzipIngest.gunzipMember(gz)._1.length }
      n
    }
    val (jdkM, _) = timeMedian(reps) {
      var n = 0L
      members.foreach { gz =>
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(gz))
        n += in.readAllBytes().length
        in.close()
      }
      n
    }

    // ---- q200-shape: concatenated members, 16-doc shards ----
    val shards = docs.grouped(16).map { g =>
      val out = new java.io.ByteArrayOutputStream()
      g.foreach { case (id, raw) =>
        out.write(GzipIngest.gzip(raw, GzipIngest.levelFor(id), s"doc_$id"))
      }
      out.toByteArray
    }.toArray
    val (ownS, _) = timeMedian(reps) {
      var n = 0L
      shards.foreach { sh =>
        GzipIngest.gunzipMembers(sh).foreach(n += _._1.length)
      }
      n
    }
    val (jdkS, _) = timeMedian(reps) {
      var n = 0L
      shards.foreach { sh =>
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(sh))
        n += in.readAllBytes().length // walks concatenated members
        in.close()
      }
      n
    }

    // ---- q186-shape: one big zlib stream (PNG IDAT framing) ----
    val big = {
      val out = new java.io.ByteArrayOutputStream()
      docs.foreach { case (_, raw) => out.write(raw) }
      out.toByteArray
    }
    val zl = {
      val d = new java.util.zip.Deflater(6, false) // zlib-wrapped
      d.setInput(big); d.finish()
      val out = new java.io.ByteArrayOutputStream(big.length / 2)
      val buf = new Array[Byte](65536)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    val (ownZ, _) = timeMedian(reps) { GzipIngest.unzlib(zl)._1.length.toLong }
    val (jdkZ, _) = timeMedian(reps) {
      val inf = new java.util.zip.Inflater(false)
      inf.setInput(zl)
      val out = new java.io.ByteArrayOutputStream(big.length)
      val buf = new Array[Byte](65536)
      while (!inf.finished()) out.write(buf, 0, inf.inflate(buf))
      inf.end()
      out.size().toLong
    }

    // ---- q186 PRODUCTION shape: per-image IDAT-sized zlib streams
    //      (~64 KB), not the monolith above ----
    val chunks = big.grouped(65536).map { raw =>
      val d = new java.util.zip.Deflater(6, false)
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2)
      val buf = new Array[Byte](65536)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }.toArray
    val (ownC, _) = timeMedian(reps) {
      var n = 0L
      chunks.foreach { c => n += GzipIngest.unzlib(c)._1.length }
      n
    }
    val (jdkC, _) = timeMedian(reps) {
      var n = 0L
      chunks.foreach { c =>
        val inf = new java.util.zip.Inflater(false)
        inf.setInput(c)
        val out = new java.io.ByteArrayOutputStream(65536)
        val buf = new Array[Byte](65536)
        while (!inf.finished()) out.write(buf, 0, inf.inflate(buf))
        inf.end()
        n += out.size()
      }
      n
    }

    // ---- encode side: own fixed-Huffman vs Deflater-6 ----
    val (ownE, _) = timeMedian(reps) {
      var n = 0L
      docs.foreach { case (_, raw) =>
        GzipIngest.deflateFixed(raw); n += raw.length
      }
      n
    }
    val (jdkE, _) = timeMedian(reps) {
      var n = 0L
      docs.foreach { case (_, raw) =>
        val d = new java.util.zip.Deflater(6, true)
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length + 64)
        while (!d.finished()) d.deflate(buf)
        d.end(); n += raw.length
      }
      n
    }

    def row(name: String, own: Double, jdk: Double, bytes: Long): Unit =
      println(f"[inflatebench] $name%-28s own ${mbs(bytes, own)}%8.1f MB/s   " +
        f"jdk ${mbs(bytes, jdk)}%8.1f MB/s   own/jdk ${jdk / own}%5.2fx " +
        f"(own $own%.3f s, jdk $jdk%.3f s)")
    row("q196 per-doc members", ownM, jdkM, rawTotal)
    row("q200 concatenated shards", ownS, jdkS, rawTotal)
    row("monolithic zlib stream", ownZ, jdkZ, big.length.toLong)
    row("q186 64KB IDAT-size zlib", ownC, jdkC, big.length.toLong)
    row("q207 encode (own=fixedH)", ownE, jdkE, rawTotal)
  }
}
