package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memoization keyed on the session OBJECT via a
  * WeakHashMap, not on `System.identityHashCode(session)`.
  *
  * The identity-hash keying had two defects: entries for a stopped
  * session were never evicted (persisted DataFrames leaked for the JVM
  * lifetime), and identityHashCode is not unique — after GC a new
  * session could collide with a dead session's key and be served
  * DataFrames bound to the stopped session. Weak keys make the whole
  * per-session map collectable the moment the session itself is, and
  * object-identity keys cannot collide while alive.
  */
object SessionCache {

  private val perSession =
    new java.util.WeakHashMap[SparkSession, TrieMap[Any, Any]]()

  private def map(s: SparkSession): TrieMap[Any, Any] =
    perSession.synchronized {
      perSession.computeIfAbsent(s, _ => TrieMap.empty[Any, Any])
    }

  /** Memoize `value` under `key` within `session`'s cache. The usual
    * TrieMap.getOrElseUpdate caveat applies (value may be computed twice
    * under a race; one wins) — fine for idempotent plan construction. */
  def getOrElseUpdate[V](session: SparkSession, key: Any)(value: => V): V =
    map(session).getOrElseUpdate(key, value).asInstanceOf[V]
}
