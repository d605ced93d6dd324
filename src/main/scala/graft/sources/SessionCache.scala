package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memoization keyed on the session OBJECT, with
  * eviction of stopped sessions on every access.
  *
  * The round-1 identity-hash keying had two defects: entries for a
  * stopped session were never evicted (persisted DataFrames leaked for
  * the JVM lifetime), and identityHashCode is not unique — after GC a
  * new session could collide with a dead session's key and be served
  * DataFrames bound to the stopped session. Object-identity keys cannot
  * collide while alive, which fixes the correctness defect outright.
  *
  * The leak is fixed by purging, NOT by weak references: cached values
  * (DataFrames) strongly reference their own SparkSession through
  * `Dataset.sparkSession`, so a WeakHashMap entry would keep its key
  * strongly reachable via its own value and never collect (the classic
  * WeakHashMap value→key pitfall). Instead, every access drops entries
  * whose underlying SparkContext has stopped — the cached plans are
  * useless the moment the session dies, and with them gone the session
  * object itself becomes collectable.
  */
object SessionCache {

  private val perSession =
    new java.util.IdentityHashMap[SparkSession, TrieMap[Any, Any]]()

  private def map(s: SparkSession): TrieMap[Any, Any] =
    perSession.synchronized {
      val it = perSession.keySet().iterator()
      while (it.hasNext) {
        if (it.next().sparkContext.isStopped) it.remove()
      }
      perSession.computeIfAbsent(s, _ => TrieMap.empty[Any, Any])
    }

  /** Memoize `value` under `key` within `session`'s cache. The usual
    * TrieMap.getOrElseUpdate caveat applies (value may be computed twice
    * under a race; one wins) — fine for idempotent plan construction. */
  def getOrElseUpdate[V](session: SparkSession, key: Any)(value: => V): V =
    map(session).getOrElseUpdate(key, value).asInstanceOf[V]
}
