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
        val cleaned = graft.etl.DedupPipeline
          .dedupIncremental(batch.sparkSession, batch.toDF(),
            corpusDir, threshold)
        cleaned.write.mode("overwrite").parquet(s"$outDir/batch=$id")
      }
      .start()
}
