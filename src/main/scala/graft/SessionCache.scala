package graft

import org.apache.spark.sql.SparkSession

/** Cross-lane session cache for deterministic build artifacts (truth
  * sets, trained codebooks, curated-corpus audits): computed once per
  * (session, input-file fingerprint) and shared by every lane that
  * derives the identical artifact — what a deployment does with build
  * outputs it serves many times. Entries live in a WeakHashMap keyed
  * by the SparkSession OBJECT, so a stopped session's artifacts die
  * with it (r12 advice: identity-hash keys can be reused after GC and
  * leak for the JVM lifetime). Derivations must be deterministic —
  * outputs are bit-identical on hit or miss, so oracles never observe
  * the cache.
  */
object SessionCache {

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, AnyRef]]())

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
      cache.computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, AnyRef]())
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
