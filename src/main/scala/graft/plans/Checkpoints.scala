package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic lifecycle management for `localCheckpoint`ed frames.
  *
  * `Dataset.localCheckpoint(eager = true)` persists the query's
  * materialized rows as a BlockManager-resident RDD and returns a new
  * Dataset over a flat [[LogicalRDD]] scan — lineage truncation that the
  * iterative algorithms here (connected components, pagerank, label
  * propagation) genuinely need. But the persisted blocks have NO
  * automatic release: Spark never unpersists a checkpointed RDD, and
  * `Dataset.unpersist` only covers `CacheManager` (`.persist`/`.cache`)
  * entries, not checkpoint blocks. Every execution of a checkpointing
  * query therefore leaks its blocks for the session lifetime — across a
  * 336-query benchmark sweep at 3 runs each that eviction pressure was
  * measured evicting the session-lifetime graph caches and landing
  * multi-second GC pauses on unrelated queries (BENCH r6: 185 s driver
  * artifact vs 125 s committed at the same HEAD, concentrated in ~10
  * spike queries).
  *
  * Two remedies, both here:
  *   - loops release round N−1's blocks as soon as round N has
  *     materialized ([[replacing]]);
  *   - harness code (Bench calls it between timed runs) releases the
  *     checkpoint blocks a finished run left behind ([[sweep]]).
  *
  * The sweep contract, stated once and shared by
  * [[graft.sources.SessionCache]]'s pinning doc: a sweep releases
  * exactly the persistent RDDs that are (a) CHECKPOINTED — CacheManager
  * buffer RDDs behind `.persist`/`.cache` are never touched, they
  * answer `isCheckpointed == false` — and (b) NOT pinned by
  * `SessionCache.pinnedRddIds`, the ids persisted during memoized
  * session-lifetime builds (whose truncated lineage cannot recompute
  * released blocks; later reuse would throw).
  *
  * Extraction relies on the checkpointed Dataset's analyzed plan being
  * exactly one [[LogicalRDD]] leaf — which `Dataset.checkpoint`'s
  * implementation guarantees (it wraps the checkpointed RDD in
  * `LogicalRDD` directly). Any other shape yields None and the frame is
  * simply left alone (never a wrong unpersist).
  */
object Checkpoints {

  /** The persisted RDD behind a `localCheckpoint`ed Dataset, if the
    * plan has the canonical single-LogicalRDD shape. */
  def rddOf(df: Dataset[_]): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _              => None
    }

  /** Release a checkpointed frame's blocks. Safe on any Dataset: a
    * non-checkpoint plan is a no-op, and a PINNED session-lifetime
    * checkpoint (a SessionCache-memoized frame passed here by
    * mistake) is skipped — its truncated lineage could never
    * recompute, so honoring the pin contract here is what makes the
    * "never a wrong unpersist" claim true (r11 review). `blocking =
    * true` makes the release synchronous — harness code between timed
    * runs wants deterministic memory state, not an async race with
    * the next measurement. */
  def unpersist(df: Dataset[_], blocking: Boolean = false): Unit =
    rddOf(df).foreach { r =>
      if (!graft.sources.SessionCache
        .pinnedRddIds(df.sparkSession).contains(r.id))
        r.unpersist(blocking)
    }

  /** Iterative-loop step: eagerly checkpoint `next`, THEN release
    * `prev`'s blocks — the materialize-before-release order is what
    * makes this safe (the new round's rows no longer depend on the old
    * round's blocks once the eager checkpoint returns). Returns the
    * checkpointed frame. Peak checkpoint residency of a loop drops from
    * O(rounds) copies of the frontier to 2. */
  def replacing[T](next: Dataset[T], prev: Dataset[_]): Dataset[T] = {
    val out = next.localCheckpoint(true)
    unpersist(prev)
    out
  }

  /** Harness sweep (the second remedy above): synchronously release
    * every persistent RDD in `session` that is checkpointed and not in
    * [[graft.sources.SessionCache.pinnedRddIds]]. Returns the released
    * ids, so callers can log what a query run leaked. Never touches
    * CacheManager buffers (`isCheckpointed == false`) or pinned
    * session-lifetime checkpoints. */
  def sweep(session: SparkSession): Seq[Int] =
    // sweepLock serializes sweeps against each other only. Build-vs-
    // sweep safety (the r11 hazard: releasing a memoized build's
    // freshly materialized checkpoint before its pin registers) comes
    // from the active-build snapshots, NOT from blocking builds — the
    // r11 whole-thunk lock deadlocked against nested builds (r12
    // advice). READ ORDER IS THE PROOF: persistent RDDs first, active
    // builds second, pins last. An RDD created by a build still active
    // at the second read is absent from that build's snapshot → the
    // forall skips it; a build that finished BEFORE the second read
    // registered its pins before deregistering, so the LATER pins read
    // covers its creations. Either way no unpinned-but-needed
    // checkpoint is ever a victim.
    graft.sources.SessionCache.sweepLock.synchronized {
      val persistent = session.sparkContext.getPersistentRDDs.toSeq
      val active = graft.sources.SessionCache.activeBuildSnapshots
      val pinned = graft.sources.SessionCache.pinnedRddIds(session)
      val victims = persistent.collect {
        case (id, rdd) if rdd.isCheckpointed && !pinned(id) &&
          active.forall(_.contains(id)) => (id, rdd)
      }
      victims.foreach { case (_, rdd) => rdd.unpersist(blocking = true) }
      victims.map(_._1)
    }

  // r12: the scoped `sweepCreatedSince(before)` variant is GONE — a
  // created-after-snapshot set-diff is not actually scoped under
  // concurrency (it released any other in-flight query's transient
  // loop checkpoint born inside the window). Concurrent callers must
  // hold the exact Dataset handles they checkpointed and release them
  // via [[unpersist]] (see DedupPipeline.dedupIncrementalTracked).
}
