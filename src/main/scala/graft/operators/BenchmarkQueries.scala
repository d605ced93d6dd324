package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Recognizable end-to-end benchmark shapes: the TPC-H Q3/Q5/Q10
  * multi-join aggregates (adapted to this dataset's columns — no
  * o_shippriority / c_address, so Q3 carries o_orderpriority and Q10
  * is trimmed to the available customer attributes), a day-of-week
  * seasonality index, and last-touch marketing attribution.
  *
  * Scale shapes: the TPC-H trio is the canonical star-join pattern —
  * date/segment/flag filters push into every scan, nation/region are
  * broadcast-sized dims, the fact-side joins shuffle on their keys and
  * AQE picks broadcast vs shuffle per side; aggregation is
  * partial+final with bounded group counts (orders, nations,
  * customers). Attribution is two frames over ONE per-user
  * sort+shuffle (same window partitioning reused); seasonality is
  * calendar-bounded like q_rolling_corr.
  *
  * Float determinism: revenue terms are per-row double products cast
  * to DECIMAL(18,4) before SUM (exact, order-independent) and emitted
  * as DOUBLE — the repo's standard money contract (QDef scaladoc).
  */
object BenchmarkQueries {

  private val revenue =
    sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")).cast("double")

  /** TPC-H Q3 (shipping-priority): top unshipped BUILDING-segment
    * orders by revenue at the cutoff date. Deterministic top-10: the
    * revenue sort key is an exact decimal-derived double, with
    * l_orderkey as the total tiebreak. */
  val qTpchQ3: QDef = QDef(
    "q_tpch_q3",
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin) { (s, d) =>
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d)
          .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d)
          .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"))
      .agg(revenue.as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 (local-supplier volume): revenue per ASIA nation where
    * the supplier and customer share the nation — the classic 6-table
    * star join with a cross-fact equality (c_nationkey = s_nationkey)
    * riding the supplier join as a residual predicate. */
  val qTpchQ5: QDef = QDef(
    "q_tpch_q5",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(
          col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q10 (returned-item reporting): top customers by revenue
    * lost to returns in one quarter, trimmed to this schema's customer
    * attributes. c_acctbal is a stored per-row double (no
    * accumulation) → ROUND(2) for the rendering seam only. */
  val qTpchQ10: QDef = QDef(
    "q_tpch_q10",
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  ROUND(c_acctbal, 2) AS c_acctbal, n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, ROUND(c_acctbal, 2), n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin) { (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(
          col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
      .agg(revenue.as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Day-of-week seasonality index of order revenue: each ISO
    * weekday's average daily revenue over the global average — the
    * first chart on any demand-planning dashboard. Day-grain decimal
    * pre-aggregate (calendar-bounded) → 7-row rollup joined to the
    * single-row global average (legitimate broadcast). Averages are
    * exact-decimal sums divided by BIGINT counts as doubles →
    * IEEE-identical; ROUND for the rendering seam. */
  val qSeasonalityDow: QDef = QDef(
    "q_seasonality_dow",
    """WITH drev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |byd AS (
      |  SELECT CAST(EXTRACT(isodow FROM day) AS INT) AS dow,
      |    COUNT(*) AS n_days,
      |    CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS avg_rev
      |  FROM drev GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS tot_avg
      |  FROM drev)
      |SELECT dow, CAST(n_days AS BIGINT) AS n_days,
      |  ROUND(avg_rev, 2) AS avg_rev,
      |  ROUND(avg_rev / tot_avg, 6) AS seasonal_index
      |FROM byd CROSS JOIN tot
      |ORDER BY dow""".stripMargin) { (s, d) =>
    val drev = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val byd = drev
      .groupBy((((dayofweek(col("day")) + 5) % 7) + 1).cast("int").as("dow"))
      .agg(count(lit(1)).as("n_days"),
        (sum(col("rev")).cast("double") / count(lit(1))).as("avg_rev"))
    val tot = drev.agg(
      (sum(col("rev")).cast("double") / count(lit(1))).as("tot_avg"))
    byd.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_days"),
        round(col("avg_rev"), 2).as("avg_rev"),
        round(col("avg_rev") / col("tot_avg"), 6).as("seasonal_index"))
      .orderBy(col("dow"))
  }

  /** Last-touch attribution: every purchase is credited to the user's
    * most recent PRECEDING click or view (click wins exact-timestamp
    * ties by rule; no touch → organic). Two MAX frames share one
    * per-user sort — one shuffle, one sort, both windows ride it. The
    * frame orders by (ts, event_id): a total order, because ROWS
    * frames over engine-dependent peer order within ts ties would be
    * nondeterministic. Purchase values accumulate in DECIMAL. */
  val qAttribution: QDef = QDef(
    "q_attribution_last_touch",
    """WITH w AS (
      |  SELECT user_id, ts, event_type, value,
      |    MAX(CASE WHEN event_type = 'click' THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc,
      |    MAX(CASE WHEN event_type = 'view' THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
      |  FROM events),
      |p AS (
      |  SELECT CASE
      |      WHEN lc IS NULL AND lv IS NULL THEN 'organic'
      |      WHEN lv IS NULL OR (lc IS NOT NULL AND lc >= lv)
      |        THEN 'click'
      |      ELSE 'view' END AS channel,
      |    value
      |  FROM w WHERE event_type = 'purchase')
      |SELECT channel, CAST(COUNT(*) AS BIGINT) AS purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
      |    AS attributed_value
      |FROM p GROUP BY channel
      |ORDER BY channel""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"),
        max(when(col("event_type") === "click", col("ts"))).over(byUser)
          .as("lc"),
        max(when(col("event_type") === "view", col("ts"))).over(byUser)
          .as("lv"))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("lc").isNull && col("lv").isNull, "organic")
          .when(col("lv").isNull ||
            (col("lc").isNotNull && col("lc") >= col("lv")), "click")
          .otherwise("view").as("channel"),
        col("value"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("purchases"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("attributed_value"))
      .orderBy(col("channel"))
  }

  /** Linear (multi-touch) attribution — the even-split policy next to
    * q_attribution_last_touch's winner-take-all: each purchase's value
    * divides equally across ALL prior click/view touches of that user;
    * no touches → organic keeps the full value. Same one-shuffle
    * window shape (running per-channel touch COUNTS instead of last
    * timestamps). Credit arithmetic is integer-exact end-to-end:
    * value → 1e4 fixed-point, per-channel credit = v₁₀ₖ·c_ch div n
    * (both engines' integer division — the sub-0.1-milli remainder is
    * truncated identically; q_prorate_cents is the largest-remainder
    * variant of the same problem), summed as BIGINT before one final
    * double division. */
  val qAttributionLinear: QDef = QDef(
    "q_attribution_linear",
    """WITH w AS (
      |  SELECT user_id, ts, event_type, value,
      |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER
      |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP),
      |       event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cc,
      |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER
      |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP),
      |       event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cv
      |  FROM events),
      |p AS (
      |  SELECT CAST(ROUND(value * 10000) AS BIGINT) AS v10k,
      |    cc, cv, cc + cv AS n
      |  FROM w WHERE event_type = 'purchase'),
      |credit AS (
      |  SELECT 'click' AS channel, COUNT(*) FILTER (WHERE cc > 0)
      |      AS purchases,
      |    SUM(CASE WHEN n > 0 THEN v10k * cc // n ELSE 0 END) AS cm
      |  FROM p
      |  UNION ALL
      |  SELECT 'view', COUNT(*) FILTER (WHERE cv > 0),
      |    SUM(CASE WHEN n > 0 THEN v10k * cv // n ELSE 0 END)
      |  FROM p
      |  UNION ALL
      |  SELECT 'organic', COUNT(*) FILTER (WHERE n = 0),
      |    SUM(CASE WHEN n = 0 THEN v10k ELSE 0 END)
      |  FROM p)
      |SELECT channel, CAST(purchases AS BIGINT) AS purchases,
      |  ROUND(CAST(cm AS DOUBLE) / 10000, 4) AS attributed_value
      |FROM credit ORDER BY channel""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val p = events(s, d)
      .select(col("user_id"), col("event_type"), col("value"),
        count(when(col("event_type") === "click", 1)).over(byUser)
          .as("cc"),
        count(when(col("event_type") === "view", 1)).over(byUser)
          .as("cv"))
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 10000).cast("bigint").as("v10k"),
        col("cc"), col("cv"), (col("cc") + col("cv")).as("n"))
    // ONE aggregation pass computes all six channel figures — three
    // separate p.agg calls would re-execute the events scan + the
    // per-user window three times; the 1-row result then unpivots into
    // the 3-row channel frame via stack()
    p.agg(
        count_if(col("cc") > 0).as("pc"),
        sum(when(col("n") > 0, expr("v10k * cc div n")).otherwise(0L))
          .as("cmc"),
        count_if(col("cv") > 0).as("pv"),
        sum(when(col("n") > 0, expr("v10k * cv div n")).otherwise(0L))
          .as("cmv"),
        count_if(col("n") === 0).as("po"),
        sum(when(col("n") === 0, col("v10k")).otherwise(0L)).as("cmo"))
      .selectExpr(
        "stack(3, 'click', pc, cmc, 'view', pv, cmv, " +
          "'organic', po, cmo) AS (channel, purchases, cm)")
      .select(col("channel"), col("purchases"),
        round(col("cm").cast("double") / 10000, 4)
          .as("attributed_value"))
      .orderBy(col("channel"))
  }

  /** Monthly revenue split between first-time and repeat customers —
    * the growth-vs-retention decomposition. The per-customer first
    * order date is a whole-partition MIN window (one shuffle on
    * custkey, no sort needed beyond the window's own), compared at
    * row grain; all of a customer's first-DAY orders count as 'new'
    * (deterministic — no within-day ordering dependence). Output is
    * months × 2. */
  val qNewVsRepeat: QDef = QDef(
    "q_new_vs_repeat",
    """WITH f AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
      |    o_totalprice,
      |    MIN(CAST(o_orderdate AS DATE))
      |      OVER (PARTITION BY o_custkey) AS first_od
      |  FROM orders)
      |SELECT CAST(date_trunc('month', od) AS DATE) AS month,
      |  CASE WHEN od = first_od THEN 'new' ELSE 'repeat' END
      |    AS cust_type,
      |  CAST(COUNT(*) AS BIGINT) AS orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue
      |FROM f GROUP BY 1, 2
      |ORDER BY month, cust_type""".stripMargin) { (s, d) =>
    val byCust = Window.partitionBy(col("o_custkey"))
    orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        col("o_totalprice"))
      .withColumn("first_od", min(col("od")).over(byCust))
      .groupBy(date_trunc("month", col("od")).cast("date").as("month"),
        when(col("od") === col("first_od"), "new").otherwise("repeat")
          .as("cust_type"))
      .agg(count(lit(1)).as("orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy(col("month"), col("cust_type"))
  }

  /** Order-size (basket) distribution with percentage share: the
    * first sanity chart on any commerce dataset. One partial+final
    * count to order grain, a re-agg to ≤ max-basket-size rows, and an
    * unpartitioned share window over that bounded output. Pure
    * integer ratios → exact cross-engine division. */
  val qBasketSizeDist: QDef = QDef(
    "q_basket_size_dist",
    """WITH s AS (
      |  SELECT l_orderkey, COUNT(*) AS items
      |  FROM lineitem GROUP BY 1)
      |SELECT CAST(items AS INT) AS basket_size,
      |  CAST(COUNT(*) AS BIGINT) AS orders,
      |  ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 4) AS pct
      |FROM s GROUP BY items
      |ORDER BY basket_size""".stripMargin) { (s, d) =>
    val all = Window.partitionBy()
    lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("items"))
      .groupBy(col("items").cast("int").as("basket_size"))
      .agg(count(lit(1)).as("orders"))
      .select(col("basket_size"), col("orders"),
        round(col("orders") * lit(100.0) / sum(col("orders")).over(all), 4)
          .as("pct"))
      .orderBy(col("basket_size"))
  }

  /** TPC-H Q4 (order-priority checking), adapted: the dataset has no
    * l_commitdate/l_receiptdate, so "late" is ship-lag > 30 days past
    * the order date. The EXISTS is a LEFT SEMI join — the fact side
    * never duplicates orders however many lines are late — and the
    * date filter pushes into the orders scan before the join. */
  val qTpchQ4: QDef = QDef(
    "q_tpch_q4",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-07-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .join(lineitem(s, d).select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q13 (customer distribution): orders-per-customer histogram
    * INCLUDING zero-order customers — the left outer join is the
    * point of the query (an inner join silently drops the zero
    * bucket). Two bounded aggregations; COUNT(o_orderkey) not
    * COUNT(*) so the null-extended row counts 0. */
  val qTpchQ13: QDef = QDef(
    "q_tpch_q13",
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS INT) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
    customer(s, d).select(col("c_custkey"))
      .join(orders(s, d).select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).cast("int").as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14 (promo effect): PROMO-type share of one month's
    * revenue. Both the conditional and total revenue accumulate in
    * exact DECIMAL inside ONE aggregate pass (no second scan for the
    * denominator); the final ratio of two exact-derived doubles
    * ROUNDs for the rendering seam only. */
  val qTpchQ14: QDef = QDef(
    "q_tpch_q14",
    """SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
      |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin) { (s, d) =>
    val disc = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", disc)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
        sum(disc).cast("double"), 4).as("promo_revenue_pct"))
  }

  /** TPC-H Q17 (small-quantity-order revenue): revenue lost if orders
    * below 20% of a part's average quantity were not taken. The
    * correlated scalar subquery decorrelates into a per-part
    * aggregate joined back to the fact — two passes over the brand's
    * lines, both partial+final aggregated. l_quantity is
    * integer-valued, so AVG is an exact-integer sum ÷ count:
    * bit-identical cross-engine, and the 0.2× threshold compare is
    * deterministic. */
  val qTpchQ17: QDef = QDef(
    "q_tpch_q17",
    """SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
      |    AS DOUBLE) / 7.0, 4) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#13'
      |  AND l_quantity < (
      |    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = part.p_partkey)""".stripMargin) { (s, d) =>
    val brandParts = part(s, d).filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey"))
    val avgQty = lineitem(s, d)
      .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("ak"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    lineitem(s, d)
      .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(avgQty, col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double") / lit(7.0), 4).as("avg_yearly"))
  }

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * exceeds 200. The HAVING applies to the orderkey-grain aggregate
    * BEFORE the customer join, so only qualifying orders (≈0.1% of
    * them) reach the join — at 100 TB that ordering is the difference
    * between joining 600 k rows and joining 600. */
  val qTpchQ18: QDef = QDef(
    "q_tpch_q18",
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |      AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
      |SELECT c_name, c_custkey, o_orderkey,
      |  CAST(o_orderdate AS DATE) AS o_orderdate,
      |  CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
      |FROM big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin) { (s, d) =>
    val big = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qsum"))
      .filter(col("qsum") > 200)
      .select(col("l_orderkey"), col("qsum").cast("double").as("total_qty"))
    big
      .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(customer(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19 (discounted revenue): three disjunctive brand/size/
    * quantity branches. The OR of brand predicates cannot push as a
    * single filter, but the part side reduces to the three brands
    * before the join (Catalyst extracts `p_brand IN (…)` from the
    * disjunction), so the join probe side stays small. */
  val qTpchQ19: QDef = QDef(
    "q_tpch_q19",
    """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
      |    AND l_quantity BETWEEN 10 AND 25)
      |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
      |    AND l_quantity BETWEEN 20 AND 35)""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#7" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#20" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 35)))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
  }

  /** TPC-H Q22 (global-sales opportunity), adapted: every synthetic
    * customer has orders, so "never ordered" becomes "dormant since
    * 2000" — an ANTI join against the recent-orders scan (date filter
    * pushed down). The above-average-balance threshold is an exact
    * DECIMAL sum ÷ BIGINT count, so the boundary compare is
    * bit-identical cross-engine (a bare AVG(double) would not be). */
  val qTpchQ22: QDef = QDef(
    "q_tpch_q22",
    """WITH t AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |      / COUNT(*) AS ab
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT CAST(c_custkey % 10 AS INT) AS cohort,
      |  CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    AS totacctbal
      |FROM customer, t
      |WHERE c_acctbal > t.ab
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val thr = customer(s, d).filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("ab"))
    customer(s, d)
      .crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("ab"))
      .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy((col("c_custkey") % 10).cast("int").as("cohort"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("totacctbal"))
      .orderBy(col("cohort"))
  }

  val defs: Seq[QDef] = Seq(
    qTpchQ3, qTpchQ5, qTpchQ10, qSeasonalityDow, qAttribution,
    qAttributionLinear, qNewVsRepeat, qBasketSizeDist, qTpchQ4,
    qTpchQ13, qTpchQ14, qTpchQ17, qTpchQ18, qTpchQ19, qTpchQ22)
}
