package graft.operators

import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Streaming-shaped operators, batch-verified (SURVEY.md §2.8).
  *
  * The exact same `window()` / `session_window()` expressions are legal
  * under `readStream` — batch/stream symmetry is a Structured Streaming
  * design invariant — so these run here against the events table and
  * (in StreamingSpec) against a MemoryStream replay of the same rows.
  * At cluster scale the streaming twins add `withWatermark` to bound
  * state and the RocksDB state store for large keyspaces.
  */
object StreamQueries {

  /** Tumbling 1-hour event-time windows per event type. */
  val qStreamTumbling: QDef = QDef(
    "q_stream_tumbling",
    """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
      |    AS w,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events
      |GROUP BY w, event_type
      |ORDER BY w, event_type""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)"))
          .cast("double").as("total"))
      .select(
        col("window.start").cast("timestamp_ntz").as("w"),
        col("event_type"), col("n"), col("total"))
      .orderBy(col("w"), col("event_type"))
  }

  /** Sliding 1-hour windows every 15 minutes: each event lands in 4
    * overlapping windows. The oracle replays that expansion with a
    * generate-range cross join (epoch-aligned buckets match Spark's
    * window grid; 2000-01-01, DuckDB's time_bucket origin, is itself
    * 15-minute-aligned to the epoch). */
  val qStreamSliding: QDef = QDef(
    "q_stream_sliding",
    """SELECT CAST(time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
      |    - k * INTERVAL '15 minutes' AS TIMESTAMP) AS w,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events, (SELECT unnest(range(4)) AS k)
      |GROUP BY w
      |ORDER BY w""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)"))
          .cast("double").as("total"))
      .select(
        col("window.start").cast("timestamp_ntz").as("w"),
        col("n"), col("total"))
      .orderBy(col("w"))
  }

  /** Session windows (30-minute inactivity gap) per user. The oracle is
    * the classic gaps-and-islands rewrite over integer microseconds
    * (SURVEY §0 fact 5); the break rule is `diff > gap` — an event at
    * EXACTLY prev+gap still merges into the session (verified against
    * Spark by the hand-computed boundary fixture in StreamingSpec). */
  val qStreamSession: QDef = QDef(
    "q_stream_session",
    """WITH t AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
      |           - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
      |             (PARTITION BY user_id ORDER BY ts) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM t)
      |SELECT user_id,
      |  CAST(MIN(ts) AS TIMESTAMP) AS session_start,
      |  CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)"))
          .cast("double").as("total"))
      .select(
        col("user_id"),
        col("session_window.start").cast("timestamp_ntz")
          .as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("n"), col("total"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Deterministic keyed dedup — the batch analog of streaming
    * `dropDuplicates` on (user_id, event_type), made deterministic by
    * keeping the row with the smallest event_id (arg-min), never an
    * arbitrary row-pick. */
  val qDedupKeyed: QDef = QDef(
    "q_dedup_keyed",
    """SELECT user_id, event_type,
      |  MIN(event_id) AS first_event_id,
      |  CAST(ARG_MIN(ts, event_id) AS TIMESTAMP) AS first_ts,
      |  ROUND(ARG_MIN(value, event_id), 2) AS first_value
      |FROM events
      |GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        min(col("event_id")).as("first_event_id"),
        min_by(col("ts"), col("event_id")).cast("timestamp_ntz")
          .as("first_ts"),
        round(min_by(col("value"), col("event_id")), 2).as("first_value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val defs: Seq[QDef] =
    Seq(qStreamTumbling, qStreamSliding, qStreamSession, qDedupKeyed)
}
