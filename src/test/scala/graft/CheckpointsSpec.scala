package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Checkpoints
import graft.sources.SessionCache

/** Lifecycle invariants of the checkpoint-hygiene machinery (the
  * Checkpoints/SessionCache/Bench-sweep contract):
  *   - `replacing` releases the previous frame's blocks and the new
  *     frame still answers;
  *   - `sweep` releases unpinned checkpoint blocks, NEVER CacheManager
  *     buffers, NEVER pinned session-lifetime checkpoints — which must
  *     still answer queries afterwards;
  *   - `rddOf`/`unpersist` are no-ops on non-checkpoint frames;
  *   - memoized builds register their persisted RDD ids as pins.
  *
  * Persistence state is observed through `sc.getPersistentRDDs` (the
  * same view the sweep acts on) — `rdd.getStorageLevel` alone can lag
  * an async unpersist.
  */
class CheckpointsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def freshFrame(n: Int) = {
    import spark.implicits._
    (1 to n).toDF("x")
  }

  test("replacing releases prev's blocks; the new frame still answers") {
    val prev = freshFrame(100).localCheckpoint(true)
    val prevId = Checkpoints.rddOf(prev).get.id
    assert(persistentIds.contains(prevId), "prev checkpoint not resident")
    val next = Checkpoints.replacing(
      prev.selectExpr("x * 2 as x"), prev)
    val nextId = Checkpoints.rddOf(next).get.id
    // prev released (synchronously observable after an eager next)...
    assert(!persistentIds.contains(prevId),
      "replacing left prev's checkpoint blocks resident")
    // ...next resident and correct
    assert(persistentIds.contains(nextId))
    assert(next.agg(org.apache.spark.sql.functions.sum("x"))
      .head.getLong(0) == 2L * 5050)
    Checkpoints.unpersist(next, blocking = true)
  }

  test("rddOf is None and unpersist a no-op on non-checkpoint frames") {
    val plain = freshFrame(10).selectExpr("x + 1 as x")
    assert(Checkpoints.rddOf(plain).isEmpty)
    Checkpoints.unpersist(plain, blocking = true) // must not throw
    assert(plain.count() == 10)
  }

  test("sweep releases unpinned checkpoints, spares CacheManager caches " +
    "and pinned session checkpoints (which still answer)") {
    // 1) per-query garbage: an unpinned localCheckpoint
    val garbage = freshFrame(50).localCheckpoint(true)
    val garbageId = Checkpoints.rddOf(garbage).get.id
    // 2) a CacheManager cache (.persist) — isCheckpointed == false.
    // NOTE: the suite shares one session, so OTHER specs' leaked
    // (unpinned) checkpoints may also be resident and will rightly be
    // swept — the buffer-survival claim is therefore asserted on the
    // NON-checkpointed persistent set, not on "everything else"
    val cached = freshFrame(60).persist(StorageLevel.MEMORY_AND_DISK)
    assert(cached.count() == 60) // materialize the buffer
    val bufferIdsBefore = spark.sparkContext.getPersistentRDDs.collect {
      case (id, rdd) if !rdd.isCheckpointed => id
    }.toSet
    // 3) a pinned session-lifetime checkpoint via the memoization path
    val key = ("checkpoints_spec_pin", System.nanoTime())
    val pinnedDf = SessionCache.getOrElseUpdate(spark, key) {
      freshFrame(70).localCheckpoint(true)
    }
    val pinnedId = Checkpoints.rddOf(pinnedDf).get.id
    assert(SessionCache.pinnedRddIds(spark).contains(pinnedId),
      "memoized build did not register its checkpoint RDD as pinned")

    val released = Checkpoints.sweep(spark)

    assert(released.contains(garbageId),
      "sweep did not release the unpinned checkpoint")
    assert(!persistentIds.contains(garbageId))
    assert(!released.contains(pinnedId),
      "sweep released a PINNED session-lifetime checkpoint")
    assert(bufferIdsBefore.forall(id => !released.contains(id)),
      "sweep touched a CacheManager buffer RDD")
    // the pinned frame must still answer — its truncated lineage could
    // not recompute released blocks, so this read is the real proof
    assert(pinnedDf.count() == 70)
    // the CacheManager cache still answers from its buffer
    assert(cached.count() == 60)
    cached.unpersist(true)
    Checkpoints.unpersist(pinnedDf, blocking = true)
  }

  test("concurrent getOrElseUpdate builds exactly once and the " +
    "memoized checkpoint's blocks survive") {
    // the cell is PUBLISHED before it is EVALUATED, so racing threads
    // resolve to one build — the old losing-build cleanup path (which
    // unpersisted the winner's freshly-checkpointed blocks) cannot run
    val key = ("race-spec", System.nanoTime())
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[
            org.apache.spark.sql.DataFrame] {
          def call(): org.apache.spark.sql.DataFrame = {
            latch.await()
            SessionCache.getOrElseUpdate(spark, key) {
              builds.incrementAndGet()
              freshFrame(25).localCheckpoint(true)
            }
          }
        })
      }
      latch.countDown()
      val dfs = futs.map(_.get())
      assert(builds.get() == 1,
        s"value built ${builds.get()} times under a race")
      assert(dfs.forall(_ eq dfs.head),
        "racing threads resolved to different values")
      val id = Checkpoints.rddOf(dfs.head).get.id
      assert(persistentIds.contains(id),
        "memoized checkpoint's blocks were unpersisted by the race")
      assert(SessionCache.pinnedRddIds(spark).contains(id),
        "memoized checkpoint not pinned")
      assert(dfs.head.count() == 25)
    } finally pool.shutdown()
  }

  test("caches and pins are CONTEXT-scoped: a same-context session " +
    "(foreachBatch's clone shape) shares memoized builds and cannot " +
    "sweep the base session's pinned checkpoints (r11 review)") {
    val clone = spark.newSession()
    val key = ("ctx-scope-spec", System.nanoTime())
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val base = SessionCache.getOrElseUpdate(spark, key) {
      builds.incrementAndGet()
      freshFrame(30).localCheckpoint(true)
    }
    val viaClone = SessionCache.getOrElseUpdate(clone, key) {
      builds.incrementAndGet()
      freshFrame(30).localCheckpoint(true)
    }
    assert(builds.get() == 1, "clone rebuilt a context-shared cache")
    assert(viaClone eq base)
    val id = Checkpoints.rddOf(base).get.id
    assert(SessionCache.pinnedRddIds(clone).contains(id),
      "clone does not see the base session's pin")
    // a sweep issued FROM the clone must spare the pinned checkpoint
    Checkpoints.sweep(clone)
    assert(persistentIds.contains(id),
      "clone-issued sweep released a pinned checkpoint")
    assert(base.count() == 30)
  }

  test("exact-handle release (the r12 concurrent-caller contract) " +
    "spares other frames; Checkpoints.unpersist skips pinned frames") {
    // pre-existing transient checkpoint (another query's in-flight
    // frontier, from the concurrent caller's perspective). The r11
    // created-since set-diff sweep would have released a concurrent
    // checkpoint born in the window; exact handles cannot.
    val preexisting = freshFrame(10).localCheckpoint(true)
    val preId = Checkpoints.rddOf(preexisting).get.id
    val mine = freshFrame(20).localCheckpoint(true)
    val myId = Checkpoints.rddOf(mine).get.id
    Checkpoints.unpersist(mine, blocking = true)
    assert(!persistentIds.contains(myId),
      "exact-handle release left my checkpoint resident")
    assert(persistentIds.contains(preId))
    assert(preexisting.count() == 10)
    Checkpoints.unpersist(preexisting, blocking = true) // cleanup
    // unpersist honors pins: a memoized frame passed by mistake stays
    val pinnedDf = SessionCache.getOrElseUpdate(
      spark, ("unpersist-pin-spec", System.nanoTime())) {
      freshFrame(15).localCheckpoint(true)
    }
    val pinnedId = Checkpoints.rddOf(pinnedDf).get.id
    Checkpoints.unpersist(pinnedDf, blocking = true)
    assert(persistentIds.contains(pinnedId),
      "unpersist destroyed a pinned session-lifetime checkpoint")
    assert(pinnedDf.count() == 15)
  }

  test("sweep after an iterative query leaves only pinned state behind") {
    // simulate a bench run: an iterative loop using replacing leaks
    // exactly its final frame; a sweep reclaims it
    var frontier = freshFrame(40).localCheckpoint(true)
    for (_ <- 1 to 3)
      frontier = Checkpoints.replacing(
        frontier.selectExpr("x + 1 as x"), frontier)
    val lastId = Checkpoints.rddOf(frontier).get.id
    assert(persistentIds.contains(lastId))
    val released = Checkpoints.sweep(spark)
    assert(released.contains(lastId))
    assert(!persistentIds.contains(lastId))
  }

  test("nested memoized build does not deadlock against a concurrent " +
    "cold build of the inner cell (r12 advice: lock-order inversion)") {
    // r11 held the global sweep lock for the whole thunk: thread A
    // (outer build) held the LOCK wanting the inner cell's MONITOR,
    // thread B (cold inner build) held the MONITOR wanting the LOCK —
    // permanent hang. The interleave is forced: B starts only once A
    // is inside its outer thunk, and A recurses into the inner cell
    // only once B is inside the inner thunk — under the r11 locking B
    // could never reach the inner thunk, so the latch timeout fails
    // the test instead of hanging it.
    val nonce = System.nanoTime()
    val innerKey = ("deadlock-inner", nonce)
    val aInOuter = new java.util.concurrent.CountDownLatch(1)
    val bInInner = new java.util.concurrent.CountDownLatch(1)
    @volatile var innerBuilds = 0
    def buildInner(): Int = SessionCache.getOrElseUpdate(
      spark, innerKey) {
      innerBuilds += 1
      bInInner.countDown()
      Thread.sleep(100) // keep B inside the thunk while A recurses
      41
    }
    @volatile var aResult = -1
    @volatile var bResult = -1
    val a = new Thread(() => {
      aResult = SessionCache.getOrElseUpdate(
        spark, ("deadlock-outer", nonce)) {
        aInOuter.countDown()
        assert(bInInner.await(
          30, java.util.concurrent.TimeUnit.SECONDS),
          "B never entered the inner thunk — the build lock is " +
            "held across thunks again (r11 deadlock shape)")
        buildInner() + 1
      }
    })
    val b = new Thread(() => {
      aInOuter.await()
      bResult = buildInner()
    })
    a.start(); b.start()
    a.join(60000); b.join(60000)
    assert(!a.isAlive && !b.isAlive, "nested-build threads deadlocked")
    assert(aResult == 42 && bResult == 41)
    assert(innerBuilds == 1, "inner cell built more than once")
  }

  test("sweep during an in-flight build spares the build's fresh, " +
    "not-yet-pinned checkpoint (active-build snapshot contract)") {
    // a transient left around from before the build IS fair game
    val stale = freshFrame(5).localCheckpoint(true)
    val staleId = Checkpoints.rddOf(stale).get.id
    val built = SessionCache.getOrElseUpdate(
      spark, ("sweep-mid-build", System.nanoTime())) {
      val fresh = freshFrame(25).localCheckpoint(true)
      val freshId = Checkpoints.rddOf(fresh).get.id
      // concurrent sweep while the build is active and the pin is not
      // yet registered — the r11 hazard window
      val t = new Thread(() => { Checkpoints.sweep(spark); () })
      t.start(); t.join(60000)
      assert(!t.isAlive, "sweep blocked behind an in-flight build")
      assert(persistentIds.contains(freshId),
        "sweep released an active build's unpinned checkpoint")
      fresh
    }
    assert(!persistentIds.contains(staleId),
      "mid-build sweep failed to release a pre-build transient")
    val builtId = Checkpoints.rddOf(built).get.id
    assert(SessionCache.pinnedRddIds(spark).contains(builtId))
    assert(built.count() == 25)
  }
}
