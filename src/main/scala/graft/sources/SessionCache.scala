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

  /** RDD ids persisted DURING a memoized build — the session-lifetime
    * caches (persisted shingle sets, checkpointed gram index, graph
    * backbones, ML-model internals). [[graft.plans.Checkpoints.sweep]]
    * (the harness sweep Bench runs between timed runs) releases exactly
    * the persistent RDDs that are checkpointed AND not in this set —
    * CacheManager buffers behind `.persist`/`.cache` are excluded by
    * the `isCheckpointed` test, so pinning only needs to protect the
    * memoized `localCheckpoint`s, whose truncated lineage cannot
    * recompute released blocks (later reuse would throw). Keyed like
    * [[perSession]]. */
  private val pinned =
    new java.util.IdentityHashMap[SparkSession, TrieMap[Int, Unit]]()

  private def map(s: SparkSession): TrieMap[Any, Any] =
    perSession.synchronized {
      val it = perSession.keySet().iterator()
      while (it.hasNext) {
        if (it.next().sparkContext.isStopped) it.remove()
      }
      perSession.computeIfAbsent(s, _ => TrieMap.empty[Any, Any])
    }

  private def pinSet(s: SparkSession): TrieMap[Int, Unit] =
    pinned.synchronized {
      val it = pinned.keySet().iterator()
      while (it.hasNext) {
        if (it.next().sparkContext.isStopped) it.remove()
      }
      pinned.computeIfAbsent(s, _ => TrieMap.empty[Int, Unit])
    }

  /** RDD ids that memoized builds have persisted in this session —
    * the set a cleanup sweep must never unpersist. */
  def pinnedRddIds(session: SparkSession): Set[Int] =
    pinSet(session).keySet.toSet

  /** A published-before-evaluated memo cell: `lazy val` gives
    * exactly-once, mutual-exclusion evaluation, so no duplicate build
    * ever runs and there are never orphaned RDDs to clean up. A build
    * that THROWS is not cached (lazy val re-evaluates on next access),
    * so transient failures don't poison the key. */
  private final class Cell(session: SparkSession, thunk: () => Any) {
    lazy val value: Any = {
      val sc = session.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val v = thunk()
      val created = sc.getPersistentRDDs.keySet.diff(before)
      if (created.nonEmpty) {
        val p = pinSet(session)
        created.foreach(id => p.put(id, ()))
      }
      v
    }
  }

  /** Memoize `value` under `key` within `session`'s cache. The cell is
    * PUBLISHED (putIfAbsent) before it is EVALUATED, so under a race
    * both threads resolve to the same cell and its `lazy val` runs the
    * build exactly once — the earlier losing-build-unpersists-winner
    * hazard (the loser's snapshot window necessarily overlapped the
    * winner's freshly-persisted RDDs, so "cleanup" destroyed the very
    * checkpoint being returned) cannot occur because no losing build
    * exists.
    *
    * Any RDD that becomes persistent while `value` is computed is
    * recorded in [[pinnedRddIds]]. Eager builds (localCheckpoint,
    * persist+count) register their data blocks here; lazy `.persist`
    * marks register at least the intent (the CacheManager entry
    * materializes its buffer RDD later, but those buffers belong to
    * the CacheManager, which sweeps never touch). Over-pinning (a
    * parallel query's RDD landing in the build's window) is harmless —
    * a pin only ever makes a sweep skip an RDD. */
  def getOrElseUpdate[V](session: SparkSession, key: Any)(value: => V): V = {
    val m = map(session)
    val cell = m.get(key) match {
      case Some(c) => hitCount.incrementAndGet(); c
      case None =>
        val fresh = new Cell(session, () => value)
        m.putIfAbsent(key, fresh) match {
          case Some(winner) => hitCount.incrementAndGet(); winner
          case None         => missCount.incrementAndGet(); fresh
        }
    }
    cell.asInstanceOf[Cell].value.asInstanceOf[V]
  }

  // ---- telemetry ---------------------------------------------------
  // Bench records per-run deltas of these into BENCH_FULL.json so a
  // driver-session slowdown can be attributed (cache eviction forcing
  // rebuilds would show as unexpected misses) without a same-HEAD
  // rerun. Process-global (a bench JVM holds one session); a lost
  // putIfAbsent race counts as a hit — the caller got an existing cell.
  private val hitCount = new java.util.concurrent.atomic.AtomicLong
  private val missCount = new java.util.concurrent.atomic.AtomicLong

  /** (hits, misses) since JVM start — monotone; callers diff. */
  def stats: (Long, Long) = (hitCount.get(), missCount.get())
}
