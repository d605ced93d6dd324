package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Window functions (SURVEY.md §2.5).
  *
  * Every window here is PARTITIONED (by customer / user / priority):
  * `WindowExec` needs each partition's rows sorted in one task, so a
  * window without PARTITION BY collapses 100 TB onto a single task.
  * Order-by keys always carry a unique tie-breaker (orderkey/event_id)
  * so ranks and frames are total — the §0 determinism contract.
  */
object WindowQueries {

  /** Top-3 orders per customer: ranking + filter. */
  val qWindowRank: QDef = QDef(
    "q_window_rank",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** rank / dense_rank / ntile / percent_rank in one pass (same window
    * spec → single sort). */
  val qWindowRankingFns: QDef = QDef(
    "q_window_ranking_fns",
    """SELECT c_nationkey, c_custkey,
      |  CAST(RANK() OVER w AS INT) AS rnk,
      |  CAST(DENSE_RANK() OVER w AS INT) AS drnk,
      |  CAST(NTILE(4) OVER w AS INT) AS quartile,
      |  ROUND(PERCENT_RANK() OVER w, 4) AS prank
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey
      |             ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_nationkey, c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer(s, d)
      .select(
        col("c_nationkey"), col("c_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 4).as("prank"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  /** lag / lead / first_value / last_value over event time per user.
    * last_value gets the explicit full frame (default frame stops at
    * CURRENT ROW in both engines, but explicit is the portable form). */
  val qWindowAnalytic: QDef = QDef(
    "q_window_analytic",
    """SELECT user_id, event_id, ROUND(value, 2) AS value,
      |  ROUND(LAG(value, 1) OVER w, 2) AS prev_value,
      |  ROUND(LEAD(value, 1) OVER w, 2) AS next_value,
      |  ROUND(FIRST_VALUE(value) OVER w, 2) AS first_v,
      |  ROUND(LAST_VALUE(value) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
      |    AS last_v
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(s, d)
      .select(
        col("user_id"), col("event_id"),
        round(col("value"), 2).as("value"),
        round(lag(col("value"), 1).over(w), 2).as("prev_value"),
        round(lead(col("value"), 1).over(w), 2).as("next_value"),
        round(first(col("value")).over(w), 2).as("first_v"),
        round(last(col("value")).over(wFull), 2).as("last_v"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Moving 10-row sum per customer (ROWS frame). DECIMAL sum keeps the
    * frame arithmetic exact on both engines. */
  val qWindowFrame: QDef = QDef(
    "q_window_frame",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS moving_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-9, Window.currentRow)
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("moving_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** RANGE frame over a numeric key: how many orders of the same
    * priority fall within 1000 below this order's price (peers included
    * by value, so ties are deterministic without a tie-break). */
  val qWindowRangeFrame: QDef = QDef(
    "q_window_range_frame",
    """SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS price,
      |  COUNT(*) OVER
      |    (PARTITION BY o_orderpriority ORDER BY o_totalprice
      |     RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_band
      |FROM orders
      |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin) {
    (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-1000, Window.currentRow)
      orders(s, d)
        .select(
          col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          count(lit(1)).over(w).as("n_band"))
        .orderBy(
          col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
  }

  /** Per-user running cumulative sum over time — the batch twin of
    * streaming per-key state (SURVEY §2.8). value has 2 decimals, so the
    * DECIMAL cumsum is exact and association-order-independent. */
  val qWindowCumsum: QDef = QDef(
    "q_window_cumsum",
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS running
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(
        col("user_id"), col("event_id"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("running"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Distribution functions: cume_dist (deterministic because the
    * window ORDER BY carries a unique tie-break) and nth_value with the
    * mandatory explicit full frame (default frame stops at CURRENT ROW,
    * which would make nth_value(…, 2) null for the first row on both
    * engines — spelled out so neither side relies on the default).
    *
    * cume_dist is deliberately UNROUNDED: with a unique tie-broken
    * order it is rn/n — one IEEE division of identical integers on both
    * engines, bit-stable as-is; ROUND would reintroduce the .5-boundary
    * trap (k/n can land exactly on a digit boundary). */
  val qWindowDistribution: QDef = QDef(
    "q_window_distribution",
    """SELECT o_orderpriority, o_orderkey,
      |  CUME_DIST() OVER
      |    (PARTITION BY o_orderpriority
      |     ORDER BY o_totalprice, o_orderkey) AS cd,
      |  NTH_VALUE(o_orderkey, 2) OVER
      |    (PARTITION BY o_orderpriority
      |     ORDER BY o_totalprice, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |    AS second_cheapest
      |FROM orders
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .select(
        col("o_orderpriority"), col("o_orderkey"),
        cume_dist().over(w).as("cd"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_cheapest"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** Forward fill / LOCF (last observation carried forward): every
    * event carries the most recent click's value for its user — the
    * canonical gap-filling operator for sparse timeseries. `last(...,
    * ignoreNulls)` over a ROWS running frame ↔ `LAST_VALUE(x IGNORE
    * NULLS)`; the (ts, event_id) tie-break keeps the carried value
    * total-ordered. One shuffle on user_id, O(1) state per row. */
  val qFillForward: QDef = QDef(
    "q_fill_forward",
    """SELECT event_id, user_id,
      |  LAST_VALUE(CASE WHEN event_type = 'click' THEN value END
      |    IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS last_click_value
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(
        col("event_id"), col("user_id"),
        last(when(col("event_type") === "click", col("value")),
          ignoreNulls = true).over(w).as("last_click_value"))
      .orderBy(col("event_id"))
  }

  /** Trailing time-window aggregate: events and spend in the PRECEDING
    * HOUR per user, as a RANGE frame over epoch microseconds (the
    * sliding-window metric computed per-row, not per-bucket — what
    * q_stream_sliding's fixed buckets can't give you). Ordering by the
    * BIGINT epoch keeps the frame arithmetic identical on both engines
    * (interval-typed frames have engine-specific peer rules). */
  val qWindowTimeRange: QDef = QDef(
    "q_window_time_range",
    """SELECT user_id, event_id,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    AS spend_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, Window.currentRow)
    events(s, d)
      .select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("spend_1h"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Rolling MEDIAN (7-row trailing, per user) — the outlier-robust
    * twin of q_window_frame's moving sum: one spike cannot drag the
    * smoothed series. An exact order statistic inside a window frame
    * (Spark's `percentile` aggregate as a window function ↔ DuckDB's
    * windowed `quantile_cont`) — bounded 7-row frames, so the per-row
    * re-rank is O(frame), not O(partition). */
  val qRollingMedian: QDef = QDef(
    "q_rolling_median",
    """SELECT event_id,
      |  ROUND(quantile_cont(value, 0.5) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    events(s, d)
      .select(col("event_id"),
        round(expr("percentile(value, 0.5)").over(w), 4).as("med7"))
      .orderBy(col("event_id"))
  }

  val defs: Seq[QDef] = Seq(
    qWindowRank, qWindowRankingFns, qWindowAnalytic, qWindowFrame,
    qWindowRangeFrame, qWindowCumsum, qWindowDistribution, qFillForward,
    qWindowTimeRange, qRollingMedian)
}
