package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Memoization keyed on the underlying SPARKCONTEXT object, with
  * eviction of stopped contexts on every access.
  *
  * The round-1 identity-hash keying had two defects: entries for a
  * stopped session were never evicted (persisted DataFrames leaked for
  * the JVM lifetime), and identityHashCode is not unique — after GC a
  * new session could collide with a dead session's key and be served
  * DataFrames bound to the stopped session. Object-identity keys cannot
  * collide while alive, which fixes the correctness defect outright.
  *
  * CONTEXT, not session (r11 review): Structured Streaming's
  * foreachBatch hands the user a CLONED session (`MicroBatchExecution`
  * runs each batch under `sparkSession.cloneSession()`), and
  * session-identity keys made every clone (a) rebuild and re-persist
  * each corpus index — two full copies in the one shared BlockManager,
  * exactly the r6 eviction pressure — and (b) see the driver session's
  * pinned checkpoints as UNPINNED, so the clone's post-batch sweep
  * released blocks whose truncated lineage could never recompute.
  * RDD blocks and the CacheManager are context-scoped, so the cache
  * and pin scope must be too.
  *
  * The leak is fixed by purging, NOT by weak references: cached values
  * (DataFrames) strongly reference their SparkSession, and a session
  * strongly references its context, so a WeakHashMap entry would keep
  * its key strongly reachable via its own value and never collect (the
  * classic WeakHashMap value→key pitfall). Instead, every access drops
  * entries whose SparkContext has stopped — the cached plans are
  * useless the moment the context dies.
  */
object SessionCache {

  /** Per-context state: the memo cells and the pinned RDD ids — one
    * record, one purge loop (they drifted as two parallel maps with
    * copy-pasted eviction; r11 review). */
  private final class Entry {
    val cache: TrieMap[Any, Any] = TrieMap.empty
    val pins: TrieMap[Int, Unit] = TrieMap.empty
  }

  private val perContext =
    new java.util.IdentityHashMap[SparkContext, Entry]()

  /** Monitor held by [[graft.plans.Checkpoints]] sweeps for their
    * victim scan+release — sweep-vs-sweep serialization only. Builds
    * do NOT take it (r12 review): the r11 design held it for the whole
    * memoized thunk, and the lazy-val cell monitor + global lock pair
    * inverted — a NESTED build (verifiedPairs→shingleSets etc.) held
    * the lock wanting an inner cell's monitor while a concurrent cold
    * build of that inner cell held its monitor wanting the lock — a
    * permanent deadlock under exactly the foreachBatch-vs-driver
    * concurrency the streaming sink creates. Build-vs-sweep safety now
    * comes from [[activeBuildSnapshots]]: a sweep skips any RDD id
    * that is not in EVERY in-flight build's start snapshot (it may be
    * that build's not-yet-pinned checkpoint). Builds hold only their
    * own cell monitors, whose order follows the acyclic build
    * dependency DAG — no cycle, no deadlock. */
  private[graft] val sweepLock = new Object

  /** In-flight memoized builds: token → the persistent-RDD-id snapshot
    * taken at build start. A persistent RDD absent from some entry's
    * snapshot may have been created by that still-running build and is
    * not yet pinned; sweeps must leave it alone. Read-ordering
    * contract for sweeps (proof in Checkpoints.sweep): snapshot
    * persistent RDDs FIRST, this set SECOND, pins LAST — a build that
    * deregistered before the second read registered its pins before
    * deregistering, so the later pins read covers its creations. */
  private val activeBuilds = TrieMap[AnyRef, Set[Int]]()

  private[graft] def activeBuildSnapshots: Seq[Set[Int]] =
    activeBuilds.values.toSeq

  private def entry(sc: SparkContext): Entry =
    perContext.synchronized {
      val it = perContext.keySet().iterator()
      while (it.hasNext) {
        if (it.next().isStopped) it.remove()
      }
      perContext.computeIfAbsent(sc, _ => new Entry)
    }

  /** RDD ids that memoized builds have persisted in this context —
    * the set a cleanup sweep must never unpersist. Context-scoped:
    * every session sharing the context (foreachBatch clones,
    * newSession) sees the same pins. */
  def pinnedRddIds(session: SparkSession): Set[Int] =
    entry(session.sparkContext).pins.keySet.toSet

  /** A published-before-evaluated memo cell: `lazy val` gives
    * exactly-once, mutual-exclusion evaluation, so no duplicate build
    * ever runs and there are never orphaned RDDs to clean up. A build
    * that THROWS is not cached (lazy val re-evaluates on next access),
    * so transient failures don't poison the key. The thunk reference
    * is dropped after evaluation so the call site's captured scope
    * does not stay reachable for the session lifetime. */
  private final class Cell(session: SparkSession, thunk0: () => Any) {
    private var thunk: () => Any = thunk0
    lazy val value: Any = {
      val sc = session.sparkContext
      val before = sc.getPersistentRDDs.keySet
      // register as in-flight BEFORE running the thunk: from here to
      // the `finally`, sweeps skip everything this build creates (ids
      // outside `before`); pins are registered before deregistration,
      // so there is no window in which a fresh checkpoint is neither
      // active-covered nor pinned (r12: replaces holding the global
      // sweep lock for the whole thunk, which deadlocked — see
      // sweepLock's doc)
      val token = new Object
      SessionCache.activeBuilds.put(token, before.toSet)
      try {
        val v = thunk()
        thunk = null
        val created = sc.getPersistentRDDs.keySet.diff(before)
        if (created.nonEmpty) {
          val p = entry(sc).pins
          created.foreach(id => p.put(id, ()))
        }
        v
      } finally SessionCache.activeBuilds.remove(token)
    }
  }

  /** Memoize `value` under `key` within the session's CONTEXT cache.
    * The cell is PUBLISHED (putIfAbsent) before it is EVALUATED, so
    * under a race both threads resolve to the same cell and its `lazy
    * val` runs the build exactly once — the earlier
    * losing-build-unpersists-winner hazard (the loser's snapshot
    * window necessarily overlapped the winner's freshly-persisted
    * RDDs, so "cleanup" destroyed the very checkpoint being returned)
    * cannot occur because no losing build exists.
    *
    * Any RDD that becomes persistent while `value` is computed is
    * recorded in [[pinnedRddIds]]. Eager builds (localCheckpoint,
    * persist+count) register their data blocks here; lazy `.persist`
    * marks register at least the intent (the CacheManager entry
    * materializes its buffer RDD later, but those buffers belong to
    * the CacheManager, which sweeps never touch). Over-pinning (a
    * parallel query's RDD landing in the build's window) only ever
    * makes a sweep SKIP an RDD — but note the pin is permanent for
    * the context lifetime, so a transient checkpoint caught in the
    * window stays unsweepable; builds register in
    * [[activeBuildSnapshots]], which keeps the window free of sweep
    * races, and concurrent checkpoint-creating queries during warm-up
    * builds are the one (accepted, documented) source of such
    * strays. */
  def getOrElseUpdate[V](session: SparkSession, key: Any)(value: => V): V = {
    val m = entry(session.sparkContext).cache
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
