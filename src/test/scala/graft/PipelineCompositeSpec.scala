package graft

import org.scalatest.funsuite.AnyFunSuite

/** q214 end-to-end composite properties:
  *  1. GATE LIVENESS: every gate genuinely fires on the fixture — at
  *     least one document is dropped (or downweighted) by each of
  *     quality, lang-ID, PII quarantine, near-dup downweighting,
  *     benchmark holdout and contamination (the r12 verdict's ask:
  *     a composite whose gates never fire proves nothing).
  *  2. CONSERVATION: per source, ingested = quality-dropped +
  *     lang-dropped + pii-quarantined + bench-excluded +
  *     contam-dropped + final (downweighting is not a drop).
  *  3. FULL INDEPENDENT RECOMPUTE: the whole chain re-derived
  *     driver-side in plain Scala (own tokenizer, own md5/minhash,
  *     own regex redaction, own pack fold — no Spark expressions),
  *     asserting every output column per source. This pins the
  *     COMPOSITION semantics (weights survive the mix, the pack
  *     respects every quarantine, contamination scans original text)
  *     against an implementation that shares nothing with the lane.
  */
class PipelineCompositeSpec extends AnyFunSuite with SparkTestBase {

  private val Stop = Set("the", "a", "of", "and", "to", "in", "is")
  private val Markers = Seq(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Set("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Set("le", "la", "les", "et", "est", "dans"),
    "es" -> Set("el", "los", "las", "y", "es", "una"))
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
  private val EntityRe = "\\b(customer|supplier|order)\\b".r

  private def h64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  private val P = 2147483647L
  private val K = 16
  private val ma = (0 until K).map(k => ((2L * k + 1) * 2654435761L) % P)
  private val mb = (0 until K).map(k => (k * 40503L * 65537L + 17L) % P)

  private def grams(toks: Array[String], n: Int): Set[Long] =
    if (toks.length < n) Set.empty
    else (0 to toks.length - n).map(i => h64(toks.slice(i, i + n).mkString(" "))).toSet

  test("q214: liveness, conservation, and a full independent recompute") {
    val got = ops.PipelineOps.pipelineComposite(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10),
         r.getDouble(11), r.getLong(12), r.getLong(13), r.getLong(14)))
      .toMap

    // ---- 1. gate liveness ----
    def tot(i: Int): Long = got.values.map(_.productElement(i).asInstanceOf[Long]).sum
    assert(tot(1) > 0, "quality gate never fired")
    assert(tot(2) > 0, "lang-ID gate never fired")
    assert(tot(3) > 0, "PII quarantine never fired")
    assert(tot(4) > 0, "near-dup downweighting never fired")
    assert(tot(5) > 0, "benchmark holdout never fired")
    assert(tot(6) > 0, "contamination gate never fired")

    // ---- 2. conservation ----
    got.foreach { case (src, t) =>
      assert(t._1 == t._2 + t._3 + t._4 + t._6 + t._7 + t._8,
        s"$src: drops + final != ingested: $t")
    }

    // ---- 3. full independent recompute ----
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Array[String] = t.split(" ", -1)
    def score(tk: Array[String]): Double = {
      val n = tk.length.toDouble
      0.4 * math.min(n / 100.0, 1.0) +
        0.3 * (tk.count(Stop.contains).toDouble / n) +
        0.3 * (tk.distinct.length.toDouble / n)
    }
    def pred(tk: Array[String]): String = {
      val sc = Markers.map { case (l, ws) => l -> tk.count(ws.contains).toLong }
      sc.zipWithIndex.collectFirst {
        case ((l, c), i) if c > 0 && sc.drop(i + 1).forall(c >= _._2) => l
      }.getOrElse("und")
    }
    val g1k = docs.filter { case (_, _, t) => score(toks(t)) >= 0.35 }
    val g2k = g1k.filter { case (_, _, t) => pred(toks(t)) != "und" }
    def nRed(t: String): Int =
      EmailRe.findAllIn(t).size + EntityRe.findAllIn(t).size
    def redact(t: String): String =
      EmailRe.replaceAllIn(EntityRe.replaceAllIn(t, "[ENTITY]"), "[EMAIL]")
    val g3k = g2k.filter { case (_, _, t) => nRed(t) < 11 }
      .map { case (id, src, t) => (id, src, t, redact(t)) }
    // minhash over the redacted survivors
    val shing: Map[Long, Set[Long]] = g3k.flatMap { case (id, _, _, rt) =>
      val tk = toks(rt)
      if (tk.length < 3) None
      else Some(id -> (0 to tk.length - 3)
        .map(i => h64(tk.slice(i, i + 3).mkString(" "))).toSet)
    }.toMap
    val sig: Map[Long, IndexedSeq[Long]] = shing.map { case (id, sh) =>
      id -> (0 until K).map(k => sh.map(h => (ma(k) * (h % P) + mb(k)) % P).min)
    }
    def bandKey(sg: IndexedSeq[Long], b: Int): Long =
      (0 until 4).map(r => sg(b * 4 + r)).foldLeft(7L)(_ * 31 + _)
    val byBand = sig.toSeq.flatMap { case (id, sg) =>
      (0 until 4).map(b => ((b, bandKey(sg, b)), id))
    }.groupBy(_._1).values.map(_.map(_._2).sorted)
    val pairs = byBand.flatMap(ids =>
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j)))
      .toSet
    val nd = pairs.filter { case (a, b) =>
      (0 until K).count(k => sig(a)(k) == sig(b)(k)).toDouble / K >= 0.5
    }
    val pmin = nd.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).min }
    val gkey = g3k.map { case (id, _, _, _) =>
      id -> math.min(id, pmin.getOrElse(id, id))
    }.toMap
    val gsize = gkey.values.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val w = gkey.map { case (id, g) => id -> 1000000L / gsize(g) }
    // bench + contamination on ORIGINAL text
    val bench = docs.filter(_._1 < 20)
      .flatMap { case (_, _, t) => grams(toks(t), 8) }.toSet
    val contam = g3k.filter(_._1 >= 20)
      .filter { case (id, _, t, _) => grams(toks(t), 8).exists(bench.contains) }
      .map(_._1).toSet
    val fin = g3k.filter { case (id, _, _, _) => id >= 20 && !contam.contains(id) }
    // per-source expectations
    val srcs = docs.map(_._2).distinct.sorted
    val finBySrc = fin.groupBy(_._2)
    val wqBySrc = srcs.map { s =>
      val fs = finBySrc.getOrElse(s, Array.empty)
      val eff = fs.map { case (id, _, _, rt) => toks(rt).length.toLong * w(id) }.sum
      s -> math.floor(math.sqrt(eff.toDouble / 1000000.0) * 1000000.0).toLong
    }.toMap
    val wqTot = wqBySrc.values.sum
    srcs.foreach { s =>
      val all = docs.filter(_._2 == s)
      val q = all.filter { case (_, _, t) => score(toks(t)) < 0.35 }
      val l = all.filter { case (_, _, t) =>
        score(toks(t)) >= 0.35 && pred(toks(t)) == "und" }
      val p = all.filter { case (_, _, t) =>
        score(toks(t)) >= 0.35 && pred(toks(t)) != "und" && nRed(t) >= 11 }
      val g3s = g3k.filter(_._2 == s)
      val dw = g3s.count { case (id, _, _, _) => w(id) < 1000000L }
      val be = g3s.count(_._1 < 20)
      val cd = g3s.count { case (id, _, _, _) => id >= 20 && contam.contains(id) }
      val fs = finBySrc.getOrElse(s, Array.empty).sortBy(_._1)
      val eff = fs.map { case (id, _, _, rt) => toks(rt).length.toLong * w(id) }.sum
      // greedy pack fold in doc_id order
      var running = 0L; var maxBin = -1L
      fs.foreach { case (_, _, _, rt) =>
        val n = toks(rt).length.toLong
        maxBin = math.max(maxBin, running / 4096L); running += n
      }
      val expect = (all.length.toLong, q.length.toLong, l.length.toLong,
        p.length.toLong, dw.toLong, be.toLong, cd.toLong, fs.length.toLong,
        fs.map(_._1).sum, eff,
        BigDecimal(wqBySrc(s).toDouble / wqTot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        math.floor(1000000000L.toDouble * wqBySrc(s) / wqTot).toLong,
        if (fs.isEmpty) 0L else maxBin + 1L,
        fs.map { case (_, _, _, rt) => toks(rt).length.toLong }.sum)
      assert(got(s) == expect, s"source $s: got ${got(s)}, recomputed $expect")
    }
  }
}
