package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Production sink patterns for the streaming layer (SURVEY §2.8/§3.4).
  *
  * [[foreachBatchParquet]] is the canonical stream→lake shape:
  * `Trigger.AvailableNow` drains whatever the source holds and stops
  * (incremental batch — the cron-driven 100 TB ingest pattern, state
  * and offsets carried in the checkpoint between invocations), and the
  * sink writes each micro-batch to a batchId-addressed directory with
  * overwrite — so when a failure replays an uncommitted batch, the
  * rewrite lands in the same directory and the result is exactly-once
  * at the file level without any sink-side transaction log.
  */
object StreamSinks {

  /** Drain `df` (a streaming DataFrame) into `outDir/batch=<id>/`
    * parquet dirs, checkpointed at `checkpoint`; returns the started
    * query (AvailableNow: terminates after the drain). Downstream reads
    * use partition discovery over `outDir` and see a `batch` column. */
  def foreachBatchParquet(
      df: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$id")
      }
      .start()

  /** Streaming ingest with inline dedup: each micro-batch of
    * (doc_id, text, …) rows is cleaned against the CORPUS at
    * `corpusDir` (exact md5 + near-dup probe of the session-cached
    * band-key index — [[graft.etl.DedupPipeline.dedupIncremental]])
    * before landing in `outDir/batch=<id>/`. The corpus index builds
    * once on the first batch and is reused by every subsequent one;
    * per-batch cost stays O(|batch|). Batch-addressed overwrite keeps
    * the exactly-once story of [[foreachBatchParquet]].
    *
    * In-batch near-dup policy applies WITHIN each micro-batch;
    * cross-batch dups are only caught against the corpus as it stood
    * at index-build time — the deliberate trade of the streaming
    * setting (re-index per batch would rescan the corpus). */
  def foreachBatchDedupParquet(
      df: DataFrame, corpusDir: String, outDir: String,
      checkpoint: String, threshold: Double = 0.5): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        // note: batch.sparkSession is the stream's CLONED session —
        // SessionCache/pins are context-keyed exactly so the clone
        // shares the driver's corpus indexes and respects its pins
        val (cleaned, ckpts) = graft.etl.DedupPipeline
          .dedupIncrementalTracked(batch.sparkSession, batch.toDF(),
            corpusDir, threshold)
        // release THIS batch's localCheckpoint blocks once the output
        // is on disk — without it every micro-batch leaks its blocks
        // for the session lifetime. EXACT handles, not a created-since
        // set-diff: the diff form released any concurrent driver
        // query's transient loop checkpoint that happened to be
        // created inside the batch window, and a released
        // localCheckpoint cannot recompute (r12 advice). finally: a
        // FAILED batch write must release them too (the replay
        // rebuilds fresh frames), or every retry leaks a pair.
        try cleaned.write.mode("overwrite").parquet(s"$outDir/batch=$id")
        finally ckpts.foreach(c =>
          graft.plans.Checkpoints.unpersist(c, blocking = true))
      }
      .start()

  /** Incremental sketch maintenance — the streaming face of the
    * mergeable-sketch stack: each micro-batch of (event_type, user_id)
    * rows folds into per-type HLL (cardinality) + frequent-items
    * (heavy hitters) blobs, which MERGE with the persisted state at
    * `stateDir` and swap back atomically (staging dir + rename, the
    * LakeOps discipline — a concurrent reader sees the old state or
    * the new, never a half-write). This is how a 100 TB pipeline keeps
    * "distinct users / hot users per type, since forever" dashboards
    * current without ever rescanning history: per batch it reads
    * |types| state rows, shuffles |types| groups, writes |types| rows.
    *
    * Sketch-merge is associative and the state write is idempotent per
    * batch replay... ALMOST: replaying an uncommitted batch after its
    * state swap double-counts into HLL (harmless — HLL union is
    * idempotent for identical items) and freq (NOT idempotent: counts
    * add). The honest exactly-once story therefore batch-addresses the
    * state (`stateDir/upto_batch=<id>`), so a replay overwrites its
    * own output instead of re-merging into it; the latest committed
    * directory is the dashboard's read point.
    *
    * The prev-state read is `_SUCCESS`-gated like [[latestSketchState]]
    * (a half-written directory is never merged as state), and after
    * each commit directories older than the newest `retainGenerations`
    * committed predecessors are pruned — the new state subsumes them.
    * The immediate predecessor must always survive (an
    * uncommitted-batch replay re-reads it to rebuild the same merge);
    * the extra generations exist for CONCURRENT READERS: a reader that
    * resolved [[latestSketchState]] to some directory keeps scanning it
    * while the stream commits — with AvailableNow's bursty drains, a
    * commit can land mid-scan, so a directory is only deleted once it
    * is `retainGenerations` commits stale. A reader slower than
    * `retainGenerations` consecutive commits can still lose its
    * directory mid-scan — size the parameter to the slowest reader,
    * or set it high and prune out-of-band. */
  def foreachBatchSketchParquet(
      df: DataFrame, stateDir: String, checkpoint: String,
      freqMapSize: Int = 1024, retainGenerations: Int = 3): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        import org.apache.spark.sql.functions._
        val s = batch.sparkSession
        val perType = batch.toDF()
          .groupBy(col("event_type"))
          .agg(
            hll_sketch_agg(col("user_id")).as("hll"),
            graft.functions.FreqSketch
              .sketch(col("user_id"), freqMapSize).as("freq"))
        val fs = new org.apache.hadoop.fs.Path(stateDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        // prev-state read under the SAME `_SUCCESS` gate the public
        // read point (latestSketchState) enforces: a directory that
        // lost its staging rename mid-crash must not be merged as
        // state here either
        val prev = fs.globStatus(
          new org.apache.hadoop.fs.Path(s"$stateDir/upto_batch=*"))
        val committedPrev = if (prev == null) Array.empty[
            org.apache.hadoop.fs.Path]
          else prev.map(_.getPath)
            .filter(p => fs.exists(
              new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
            .filter(_.getName.stripPrefix("upto_batch=").toLong < id)
            .sortBy(_.getName.stripPrefix("upto_batch=").toLong)
        val prevDir = committedPrev.lastOption
        val merged = prevDir match {
          case None => perType
          case Some(p) =>
            s.read.parquet(p.toString)
              .unionByName(perType)
              .groupBy(col("event_type"))
              .agg(
                hll_union_agg(col("hll")).as("hll"),
                graft.functions.FreqSketch
                  .merge(col("freq"), freqMapSize).as("freq"))
        }
        // batch-addressed commit through a staging dir + rename (the
        // JetCsvWrite/LakeOps discipline): the final path appears only
        // complete, so latestSketchState never reads a half-write —
        // and a replay overwrites its own staging dir then re-swaps
        val staging = new org.apache.hadoop.fs.Path(
          s"$stateDir/.staging_upto_batch=$id")
        val committed = new org.apache.hadoop.fs.Path(
          s"$stateDir/upto_batch=$id")
        fs.delete(staging, true)
        merged.write.mode("overwrite").parquet(staging.toString)
        fs.delete(committed, true)
        if (!fs.rename(staging, committed))
          throw new java.io.IOException(
            s"sketch-state commit failed: $staging -> $committed")
        // retention: the merged state at `id` SUBSUMES every earlier
        // directory. The immediate predecessor is non-negotiable (a
        // crash between this rename and the checkpoint commit replays
        // batch `id`, and the replay's prev-state read needs the
        // latest directory BELOW id to rebuild the same merge);
        // further generations are kept only as a grace window for
        // readers that resolved latestSketchState just before a
        // commit burst — see the scaladoc's retainGenerations
        // contract.
        committedPrev.dropRight(math.max(1, retainGenerations))
          .foreach(p => fs.delete(p, true))
        // crashed half-writes (no `_SUCCESS`) below the newest
        // committed predecessor can never become valid state — their
        // batch will never replay once a later batch committed, and
        // reads are `_SUCCESS`-gated anyway — so prune them too, or
        // they accumulate in stateDir indefinitely
        prevDir.foreach { newest =>
          val newestId =
            newest.getName.stripPrefix("upto_batch=").toLong
          if (prev != null) prev.map(_.getPath)
            .filter(p => !fs.exists(
              new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
            .filter(_.getName.stripPrefix("upto_batch=")
              .toLong < newestId)
            .foreach(p => fs.delete(p, true))
          // same fate for orphaned STAGING dirs (crash mid-write
          // before the rename — the more common artifact): a batch
          // below the newest committed predecessor will never replay,
          // so its staging can never be re-swapped
          val stale = fs.globStatus(new org.apache.hadoop.fs.Path(
            s"$stateDir/.staging_upto_batch=*"))
          if (stale != null) stale.map(_.getPath)
            .filter(_.getName.stripPrefix(".staging_upto_batch=")
              .toLong < newestId)
            .foreach(p => fs.delete(p, true))
        }
      }
      .start()

  /** Read point for [[foreachBatchSketchParquet]]'s state: the latest
    * COMMITTED `upto_batch=` directory — a `_SUCCESS` marker is
    * required, so a crash mid-write (before the staging rename) can
    * never be mistaken for state (None before the first drain).
    *
    * Lifecycle contract: batch ids come from the CHECKPOINT, so the
    * state dir and the checkpoint must be retired together — resetting
    * the checkpoint alone restarts ids at 0 and the old run's
    * highest-id directory would keep winning this glob. */
  def latestSketchState(
      spark: org.apache.spark.sql.SparkSession,
      stateDir: String): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$stateDir/upto_batch=*"))
    if (dirs == null) None
    else dirs.map(_.getPath)
      .filter(p => fs.exists(
        new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .sortBy(_.getName.stripPrefix("upto_batch=").toLong)
      .lastOption
      .map(p => spark.read.parquet(p.toString))
  }
}
