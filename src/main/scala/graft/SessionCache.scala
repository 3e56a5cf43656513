package graft

import org.apache.spark.sql.SparkSession

/** Cross-lane session cache for deterministic build artifacts (truth
  * sets, trained codebooks, curated-corpus audits): computed once per
  * (session, input-file fingerprint) and shared by every lane that
  * derives the identical artifact — what a deployment does with build
  * outputs it serves many times. Entries are keyed by the
  * SparkSession OBJECT (identity — r12 advice: identity-HASH keys can
  * be reused after GC and collide across sessions) and evicted
  * EXPLICITLY by a SparkListener on application end: weak keys alone
  * never collect here, because cached values (localCheckpoint'd
  * DataFrames, trained kits) hold strong references back to their
  * session — a value-to-key strong reference pins a WeakHashMap entry
  * for the JVM lifetime (r13 ADVICE). Derivations must be
  * deterministic — outputs are bit-identical on hit or miss, so
  * oracles never observe the cache.
  */
object SessionCache {

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, AnyRef]]())

  /** Registered once per cached session (piggybacking on the same
    * synchronized computeIfAbsent that creates its entry): when the
    * session's underlying context ends, drop the entry — the explicit
    * eviction the weak key cannot deliver (see object doc).
    */
  private def evictOnEnd(s: SparkSession): Unit =
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          cache.synchronized { cache.remove(s) }
          ()
        }
      })

  /** Compute-once per (session, kind, fingerprint of `files`). NOT
    * computeIfAbsent: cached builds nest (a trained kit derives from
    * the untrained kit), and a nested computeIfAbsent on the same
    * ConcurrentHashMap throws "Recursive update" — compute outside the
    * map; a concurrent duplicate build races benignly (deterministic
    * artifacts) and first-write-wins keeps one canonical instance.
    */
  def cachedAs[T <: AnyRef](s: SparkSession, kind: String,
                            files: Seq[String])(f: => T): T = {
    val perSession = cache.synchronized {
      var created = false
      val m = cache.computeIfAbsent(s, { _ =>
        created = true
        new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
      })
      if (created) evictOnEnd(s)
      m
    }
    val key = kind + "|" + Fixtures.fingerprint(files)
    val existing = perSession.get(key)
    if (existing != null) existing.asInstanceOf[T]
    else {
      val v = f
      val prev = perSession.putIfAbsent(key, v)
      (if (prev != null) prev else v).asInstanceOf[T]
    }
  }
}
