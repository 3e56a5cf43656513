package graft

/** Driver-side plain-Scala recompute of the q214/q215 pipeline chain —
  * own tokenizer, own md5/minhash, own regex redaction; shares NOTHING
  * with the lanes (no Spark expressions), so agreement pins the
  * composition semantics, not a common implementation.
  */
object PipelineRecompute {

  val Stop = Set("the", "a", "of", "and", "to", "in", "is")
  val Markers = Seq(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Set("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Set("le", "la", "les", "et", "est", "dans"),
    "es" -> Set("el", "los", "las", "y", "es", "una"))
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
  val EntityRe = "\\b(customer|supplier|order)\\b".r

  def h64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  val P = 2147483647L
  val K = 16
  val ma: IndexedSeq[Long] = (0 until K).map(k => ((2L * k + 1) * 2654435761L) % P)
  val mb: IndexedSeq[Long] = (0 until K).map(k => (k * 40503L * 65537L + 17L) % P)

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

  def nRed(t: String): Int =
    EmailRe.findAllIn(t).size + EntityRe.findAllIn(t).size

  def redact(t: String): String =
    EmailRe.replaceAllIn(EntityRe.replaceAllIn(t, "[ENTITY]"), "[EMAIL]")

  def grams(tk: Array[String], n: Int): Set[Long] =
    if (tk.length < n) Set.empty
    else (0 to tk.length - n).map(i => h64(tk.slice(i, i + n).mkString(" "))).toSet

  def sigOf(sh: Set[Long]): IndexedSeq[Long] =
    (0 until K).map(k => sh.map(h => (ma(k) * (h % P) + mb(k)) % P).min)

  def bandKey(sg: IndexedSeq[Long], b: Int): Long =
    (0 until 4).map(r => sg(b * 4 + r)).foldLeft(7L)(_ * 31 + _)

  def estJ(a: IndexedSeq[Long], b: IndexedSeq[Long]): Double =
    (0 until K).count(k => a(k) == b(k)).toDouble / K

  /** Signatures (only for docs with >= 3 redacted tokens). */
  def sigsOf(docs: Seq[(Long, String)]): Map[Long, IndexedSeq[Long]] =
    docs.flatMap { case (id, rt) =>
      val tk = toks(rt)
      if (tk.length < 3) None
      else Some(id -> sigOf(
        (0 to tk.length - 3).map(i => h64(tk.slice(i, i + 3).mkString(" "))).toSet))
    }.toMap

  /** Banded candidate pairs (a, b) with a < b from one signature set. */
  def bandedPairs(sig: Map[Long, IndexedSeq[Long]]): Set[(Long, Long)] = {
    val byBand = sig.toSeq.flatMap { case (id, sg) =>
      (0 until 4).map(b => ((b, bandKey(sg, b)), id))
    }.groupBy(_._1).values.map(_.map(_._2).sorted)
    byBand.flatMap(ids =>
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j)))
      .toSet
  }

  /** Cross-set banded candidates (left id, right id). */
  def bandedCross(l: Map[Long, IndexedSeq[Long]],
                  r: Map[Long, IndexedSeq[Long]]): Set[(Long, Long)] = {
    val lb = l.toSeq.flatMap { case (id, sg) =>
      (0 until 4).map(b => ((b, bandKey(sg, b)), id)) }.groupBy(_._1)
    val rb = r.toSeq.flatMap { case (id, sg) =>
      (0 until 4).map(b => ((b, bandKey(sg, b)), id)) }.groupBy(_._1)
    lb.keySet.intersect(rb.keySet).flatMap { k =>
      for (a <- lb(k).map(_._2); b <- rb(k).map(_._2)) yield (a, b)
    }
  }

  final case class Chain(
      g1k: Array[(Long, String, String)],          // (id, source, text)
      g2k: Array[(Long, String, String)],
      g3k: Array[(Long, String, String, String)],  // + rtext
      w: Map[Long, Long],                          // dup weight e6 per g3k id
      benchGrams: Set[Long],
      contam: Set[Long],
      fin: Array[(Long, String, String, String)])  // final survivors

  /** The full base chain over collected (doc_id, source, text) rows. */
  def chain(docs: Array[(Long, String, String)]): Chain = {
    val g1k = docs.filter { case (_, _, t) => score(toks(t)) >= 0.35 }
    val g2k = g1k.filter { case (_, _, t) => pred(toks(t)) != "und" }
    val g3k = g2k.filter { case (_, _, t) => nRed(t) < 11 }
      .map { case (id, src, t) => (id, src, t, redact(t)) }
    val sig = sigsOf(g3k.map { case (id, _, _, rt) => (id, rt) }.toSeq)
    val nd = bandedPairs(sig).filter { case (a, b) => estJ(sig(a), sig(b)) >= 0.5 }
    val pmin = nd.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).min }
    val gkey = g3k.map { case (id, _, _, _) =>
      id -> math.min(id, pmin.getOrElse(id, id)) }.toMap
    val gsize = gkey.values.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val w = gkey.map { case (id, g) => id -> 1000000L / gsize(g) }
    val bench = docs.filter(_._1 < 20)
      .flatMap { case (_, _, t) => grams(toks(t), 8) }.toSet
    val contam = g3k.filter(_._1 >= 20)
      .filter { case (_, _, t, _) => grams(toks(t), 8).exists(bench.contains) }
      .map(_._1).toSet
    val fin = g3k.filter { case (id, _, _, _) => id >= 20 && !contam.contains(id) }
    Chain(g1k, g2k, g3k, w, bench, contam, fin)
  }
}
