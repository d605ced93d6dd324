package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-facing builders (SURVEY.md §2.8, §3.4).
  *
  * Each takes ANY events-shaped DataFrame — batch (`spark.read`) or
  * streaming (`spark.readStream`) — and returns the aggregation; this
  * is the batch/stream symmetry Structured Streaming guarantees. The
  * streaming caller adds `.writeStream` + checkpointing; watermarks
  * bound state (late rows beyond the delay are dropped — asserted in
  * StreamingSpec) and are a no-op in batch.
  *
  * 100 TB notes: shuffle is keyed by (window/session, keys); set the
  * RocksDB state store provider for large keyspaces
  * (`spark.sql.streaming.stateStore.providerClass`), and size
  * watermark delay to the real out-of-orderness — state growth is
  * delay × key-arrival rate.
  */
object StreamOps {

  /** Fully-qualified RocksDB state store provider class. */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Switch the session's streaming state store to RocksDB — the large-
    * keyspace configuration (SURVEY §4.3): per-key state lives off-heap
    * and on local disk per executor instead of in the JVM heap, with
    * changelog checkpointing to the checkpoint location. Required by
    * `transformWithState`; recommended for any stateful query whose key
    * cardinality at 100 TB (users, sessions, dedup keys) dwarfs executor
    * heap. Takes effect for queries STARTED after the change; a restore
    * function is returned for test hygiene. */
  def configureRocksDBStateStore(
      spark: org.apache.spark.sql.SparkSession): () => Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDBProvider)
    () => prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Tumbling event-time windows with optional watermark. */
  def tumblingCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(
        col("window.start").as("w"), col("event_type"), col("n"),
        col("total"))
  }

  /** Sliding windows (each event in window/slide buckets). */
  def slidingCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      slide: String = "15 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(window(col("ts"), window_, slide))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("window.start").as("w"), col("n"), col("total"))
  }

  /** Session windows per user (gap-based; close rule diff > gap). */
  def sessionAggregates(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n"), col("total"))
  }

  /** Streaming dedup on explicit keys. With a watermark this uses
    * `dropDuplicatesWithinWatermark`, the variant whose state actually
    * IS evicted by watermark advance — plain `dropDuplicates` only
    * bounds state when the event-time column is itself one of the keys,
    * so on arbitrary keys it grows forever. Without a watermark (batch
    * or intentionally-unbounded streams) it is a plain dropDuplicates.
    */
  def dedupByKey(events: DataFrame, keys: Seq[String],
      watermark: Option[String] = None): DataFrame =
    watermark match {
      case Some(w) =>
        events.withWatermark("ts", w).dropDuplicatesWithinWatermark(keys)
      case None => events.dropDuplicates(keys)
    }

  /** Stream-stream interval join (the impression→click attribution
    * shape): rows join when keys match AND the right event lands within
    * `[left.ts, left.ts + within]`.
    *
    * Both sides carry the watermark and the join condition carries the
    * time bound — together they let Structured Streaming EVICT buffered
    * rows once the watermark passes `ts + within + maxDelay`, so state
    * is bounded by (delay + window) × arrival rate, not by stream
    * length. Without the time bound the engine must buffer both streams
    * forever — the classic unbounded-state trap. Outer variants emit
    * the unmatched side only once the watermark proves no match can
    * still arrive.
    *
    * Column names must be disjoint apart from `key`; the right side's
    * key column is dropped from the output. Works identically on batch
    * DataFrames (watermarks are a no-op there) — the batch/stream
    * symmetry the rest of this object follows.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      within: String,
      maxDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, maxDelay)
    val r = right.withWatermark(rightTs, maxDelay)
    val cond = l(key) === r(key) &&
      r(rightTs) >= l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within")
    l.join(r, cond, joinType).drop(r(key))
  }
}
