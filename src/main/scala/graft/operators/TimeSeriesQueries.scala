package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Time-series diagnostics over the daily order-revenue series — the
  * KPI-series toolkit that sits between the point statistics
  * (StatExtQueries' changepoint/CUSUM/Bollinger) and forecasting:
  * autocorrelation structure, robust trend, and a forecast backtest.
  *
  * Scale shape shared by all three: the fact table collapses to the
  * DAY grain first (one partial+final hash aggregate over orders —
  * the only pass that touches fact rows), and everything after runs
  * on a calendar-bounded series (~2.4k rows for the 6.6-year fixture;
  * ~37k rows even for a century of days). Single-partition windows
  * and the Theil–Sen pair join are therefore bounded by the CALENDAR,
  * not the data volume — the 100 TB cost center is the day-grain
  * aggregate, which partial-aggregates map-side before one shuffle.
  *
  * Float determinism (QDef contract): daily revenue is an exact
  * DECIMAL(18,2); all moment sums (Σx, Σy, Σxy, Σx², Σy²) stay exact
  * DECIMAL (a (18,2)×(18,2) product is an exact (37,4)); only the
  * final correlation/slope formulas run in DOUBLE on bit-identical
  * inputs. Medians are ORDER-STATISTIC SELECTIONS (row_number =
  * (n+1) DIV 2 — the low median), never interpolated: interpolation
  * would average two doubles whose evaluation order `a+(b-a)*g` vs
  * `(a+b)*g` is engine-private, while selection is exact on both
  * engines. The MAPE sum quantizes each per-day ratio to integer
  * PICO-units (FLOOR(ape·1e12) AS BIGINT) so the cross-day sum is a
  * primitive long — exact, order-independent, hash-aggregable (the
  * GraphQueries femto-unit trick).
  */
object TimeSeriesQueries {

  private val maxLag = 7

  /** Day-grain revenue series (exact DECIMAL) — the shared input. */
  private def dailyRev(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))

  private val dailyRevSql =
    """drev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1)""".stripMargin

  /** Autocorrelation function of daily revenue at lags 1..7: one
    * window pass computes all seven leads, an explode fans each day
    * into its (lag, x, y) pairs, and one grouped aggregate per lag
    * computes the exact-decimal moment sums — never seven self-joins.
    * The ACF is THE diagnostic that decides whether a KPI series is
    * forecastable and at what seasonality (lag-7 high → weekly
    * pattern; all lags ≈ 0 → noise). */
  val qAutocorr: QDef = {
    val leadsSql = (1 to maxLag)
      .map(k => s"LEAD(rev, $k) OVER (ORDER BY day) AS l$k")
      .mkString(",\n    ")
    val armsSql = (1 to maxLag)
      .map(k => s"SELECT $k AS lag, rev AS x, l$k AS y FROM ld " +
        s"WHERE l$k IS NOT NULL")
      .mkString("\n  UNION ALL\n  ")
    QDef(
      "q_autocorr",
      s"""WITH $dailyRevSql,
         |ld AS (
         |  SELECT rev,
         |    $leadsSql
         |  FROM drev),
         |pairs AS (
         |  $armsSql),
         |m AS (
         |  SELECT lag, CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
         |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
         |    CAST(SUM(y * y) AS DOUBLE) AS syy
         |  FROM pairs GROUP BY lag)
         |SELECT lag, CAST(n AS BIGINT) AS n,
         |  ROUND((n * sxy - sx * sy) /
         |    SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
         |FROM m ORDER BY lag""".stripMargin) { (s, d) =>
      val w = Window.orderBy(col("day"))
      val ld = dailyRev(s, d).select(
        col("rev") +: (1 to maxLag).map(k =>
          lead(col("rev"), k).over(w).as(s"l$k")): _*)
      val pairs = ld
        .select(explode(array((1 to maxLag).map(k =>
          struct(lit(k).as("lag"), col("rev").as("x"),
            col(s"l$k").as("y"))): _*)).as("p"))
        .select(col("p.lag").as("lag"), col("p.x").as("x"),
          col("p.y").as("y"))
        .filter(col("y").isNotNull)
      val m = pairs.groupBy(col("lag")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      m.select(col("lag"), col("n").cast("bigint").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("acf"))
        .orderBy(col("lag"))
    }
  }

  /** Theil–Sen robust trend of daily revenue: the LOW MEDIAN of all
    * pairwise slopes (rev_j − rev_i)/(j − i), plus the matching
    * median-residual intercept — the outlier-proof answer to "is this
    * KPI actually growing?" (OLS — q_regr_ols — lets one promo day
    * drag the whole line). The pair join is quadratic IN DAYS ONLY
    * (~2.9M pairs for 6.6 years): a broadcast nested-loop over the
    * day-grain series, never over fact rows. Slope numerators are
    * exact decimal diffs; each division is one double op on identical
    * inputs; the median is an exact selection (header note).
    *
    * Execution shape (round-5 rework, 4.9 s → ~0.9 s at sf0.1): both
    * median ranks and n_pairs = n·(n−1)/2 derive arithmetically from
    * the day count, so no COUNT() window ever materializes. The slope
    * median never globally sorts the 2.9M-pair set (a single-task
    * WindowExec was 2.5 s of the 4.9): the pairs are RANGE-partitioned
    * on slope and localCheckpoint'ed (also lifting them out of the
    * day-series' single window partition), the per-partition counts
    * (32 rows) locate which partition holds the target rank and its
    * global offset, and only THAT partition's ~1/32 slice is rank-
    * selected with a window — the two-level distributed selection,
    * exact because rank→value is invariant to where partition
    * boundaries fall (ties are equal values). An approx_percentile
    * bracket was tried first and was no faster than the sort it
    * replaced: GK-sketch insertion over millions of rows costs more
    * than one partitioned shuffle. */
  val qTheilSen: QDef = QDef(
    "q_theil_sen",
    s"""WITH $dailyRevSql,
       |g AS (
       |  SELECT rev, ROW_NUMBER() OVER (ORDER BY day) AS i FROM drev),
       |pairs AS (
       |  SELECT CAST(b.rev - a.rev AS DOUBLE) / (b.i - a.i) AS slope
       |  FROM g a JOIN g b ON b.i > a.i),
       |ms AS (
       |  SELECT slope FROM (
       |    SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rnk,
       |      COUNT(*) OVER () AS cnt
       |    FROM pairs)
       |  WHERE rnk = (cnt + 1) // 2),
       |res AS (
       |  SELECT CAST(g.rev AS DOUBLE) - ms.slope * g.i AS r
       |  FROM g CROSS JOIN ms),
       |mi AS (
       |  SELECT r FROM (
       |    SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rnk,
       |      COUNT(*) OVER () AS cnt
       |    FROM res)
       |  WHERE rnk = (cnt + 1) // 2)
       |SELECT nd.n AS n_days, np.n AS n_pairs,
       |  ROUND(ms.slope, 6) AS slope, ROUND(mi.r, 2) AS intercept
       |FROM ms CROSS JOIN mi
       |CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g) nd
       |CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pairs) np
       |""".stripMargin) { (s, d) =>
    // the day-grain series is bounded (~2.4k rows here, ≤ ~10k ever):
    // checkpoint it once and count it — every rank below is arithmetic
    val g = dailyRev(s, d).select(col("rev"),
      row_number().over(Window.orderBy(col("day"))).as("i"))
      .localCheckpoint()
    val nDays = g.count()
    val nPairs = nDays * (nDays - 1) / 2
    // stream side spread to 32 partitions BEFORE the NLJ: the day
    // series arrives in the window's single partition, and an NLJ
    // from one partition emits all 2.9M pairs through one task (the
    // downstream range shuffle then serializes single-threaded)
    val pairs = g.repartition(32).as("a")
      .join(broadcast(g).as("b"), col("b.i") > col("a.i"))
      .select(((col("b.rev") - col("a.rev")).cast("double") /
        (col("b.i") - col("a.i"))).as("slope"))
    // exact rank selection: small inputs sort directly; large inputs
    // range-partition + checkpoint, then only the partition holding
    // the rank is sorted (two-level distributed selection)
    def lowMedian(df: DataFrame, c: String, rank: Long, n: Long)
        : DataFrame =
      if (n <= 100000)
        df.select(col(c),
            row_number().over(Window.orderBy(col(c))).as("rnk"))
          .filter(col("rnk") === rank)
          .select(col(c))
      else {
        val chk = df.repartitionByRange(32, col(c)).localCheckpoint()
        val cnts = chk
          .groupBy(spark_partition_id().as("pid")).count()
          .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        var acc = 0L
        var target = -1
        var off = 0L
        for ((pid, cnt) <- cnts if target < 0) {
          if (acc + cnt >= rank) { target = pid; off = acc }
          acc += cnt
        }
        // replacing: once the 1-row rank result is materialized, the
        // full-column range-partitioned checkpoint has no consumer —
        // release it inside the query instead of leaking it to the
        // harness sweep (this is the per-execution block the r6/r7
        // bench regressions traced to)
        graft.plans.Checkpoints.replacing(
          chk.filter(spark_partition_id() === target)
            .select(col(c),
              row_number().over(Window.orderBy(col(c))).as("rnk"))
            .filter(col("rnk") === rank - off)
            .select(col(c)),
          chk)
      }
    val ms = broadcast(
      lowMedian(pairs, "slope", (nPairs + 1) / 2, nPairs)
        .localCheckpoint())
    val res = g.crossJoin(ms)
      .select((col("rev").cast("double") - col("slope") * col("i"))
        .as("r"))
    val mi = lowMedian(res, "r", (nDays + 1) / 2, nDays)
    // every joined side is a single row — broadcast explicitly; the
    // bare crossJoin planned a CartesianProductExec (caught by
    // PlanSpec's suite-wide sweep)
    ms.crossJoin(broadcast(mi))
      .select(lit(nDays).as("n_days"), lit(nPairs).as("n_pairs"),
        round(col("slope"), 6).as("slope"),
        round(col("r"), 2).as("intercept"))
  }

  /** Seasonal-naive forecast backtest: predict each day's revenue
    * with the value seven CALENDAR days earlier (a real date join,
    * not a row shift — gaps don't misalign weeks), then score per ISO
    * weekday: bias (exact-decimal mean error) and MAPE (pico-unit
    * quantized — header note). The zero-parameter baseline every real
    * forecast must beat; scoring it per weekday shows WHICH days
    * carry the seasonal signal. */
  val qSeasonalNaive: QDef = QDef(
    "q_seasonal_naive",
    s"""WITH $dailyRevSql,
       |f AS (
       |  SELECT c.day, c.rev, p.rev AS hat
       |  FROM drev c JOIN drev p ON p.day = c.day - 7),
       |e AS (
       |  SELECT CAST(EXTRACT(isodow FROM day) AS INT) AS dow,
       |    rev - hat AS err,
       |    CAST(FLOOR(CAST(ABS(rev - hat) AS DOUBLE)
       |      / CAST(rev AS DOUBLE) * 1e12) AS BIGINT) AS ape_pico
       |  FROM f)
       |SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
       |  ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*), 2) AS bias,
       |  ROUND(CAST(SUM(ape_pico) AS DOUBLE) / 1e12 / COUNT(*), 6)
       |    AS mape
       |FROM e GROUP BY dow ORDER BY dow""".stripMargin) { (s, d) =>
    val drev = dailyRev(s, d)
    val f = drev.as("c")
      .join(drev.as("p"), col("p.day") === date_sub(col("c.day"), 7))
      .select(col("c.day").as("day"), col("c.rev").as("rev"),
        col("p.rev").as("hat"))
    val e = f.select(
      (((dayofweek(col("day")) + 5) % 7) + 1).cast("int").as("dow"),
      (col("rev") - col("hat")).as("err"),
      floor(abs(col("rev") - col("hat")).cast("double") /
        col("rev").cast("double") * lit(1e12)).cast("bigint")
        .as("ape_pico"))
    e.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("err")).cast("double") / count(lit(1)), 2)
          .as("bias"),
        round(sum(col("ape_pico")).cast("double") / lit(1e12) /
          count(lit(1)), 6).as("mape"))
      .orderBy(col("dow"))
  }

  /** Additive STL-style decomposition of daily revenue:
    * trend = centered 7-day moving average (full windows only),
    * seasonal = per-ISO-weekday mean of the detrended series,
    * residual = the rest. The classic "is the spike weather or
    * weekday?" decomposition, all in three bounded passes over the
    * calendar-grain series (one centered window, one 7-row aggregate
    * broadcast back, zero self-joins).
    *
    * Determinism without rounding: the trend divides an exact-decimal
    * window sum ONCE in double; the detrended values quantize to
    * integer micro-units (FLOOR — exact on identical doubles) so the
    * per-weekday mean is a ratio of exact integers; every output
    * column is then an identical IEEE sequence on both engines and is
    * emitted UNROUNDED — there is no decimal boundary to disagree on
    * (a ROUND here would CREATE the seam it usually closes: micro-unit
    * means can land exactly on .XXXX5). */
  val qStlDecompose: QDef = QDef(
    "q_stl_decompose",
    s"""WITH $dailyRevSql,
       |w AS (
       |  SELECT day, rev,
       |    SUM(rev) OVER (ORDER BY day
       |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
       |    COUNT(*) OVER (ORDER BY day
       |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
       |  FROM drev),
       |b AS (
       |  SELECT day, CAST(rev AS DOUBLE) AS rev,
       |    CAST(s7 AS DOUBLE) / 7 AS trend,
       |    CAST(EXTRACT(isodow FROM day) AS INT) AS dow,
       |    CAST(rev AS DOUBLE) - CAST(s7 AS DOUBLE) / 7 AS detr,
       |    CAST(FLOOR((CAST(rev AS DOUBLE) - CAST(s7 AS DOUBLE) / 7)
       |      * 1e6) AS BIGINT) AS dmicro
       |  FROM w WHERE n7 = 7),
       |se AS (
       |  SELECT dow,
       |    CAST(SUM(dmicro) AS DOUBLE) / COUNT(*) / 1e6 AS seasonal
       |  FROM b GROUP BY dow)
       |SELECT b.day, b.rev, b.trend, se.seasonal,
       |  b.detr - se.seasonal AS residual
       |FROM b JOIN se USING (dow)
       |ORDER BY day""".stripMargin) { (s, d) =>
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val b = dailyRev(s, d)
      .select(col("day"), col("rev"),
        sum(col("rev")).over(w7).as("s7"),
        count(lit(1)).over(w7).as("n7"))
      .filter(col("n7") === 7)
      .select(col("day"),
        col("rev").cast("double").as("rev"),
        (col("s7").cast("double") / 7).as("trend"),
        (((dayofweek(col("day")) + 5) % 7) + 1).cast("int").as("dow"))
      .withColumn("detr", col("rev") - col("trend"))
      .withColumn("dmicro",
        floor(col("detr") * lit(1e6)).cast("bigint"))
    val se = b.groupBy(col("dow"))
      .agg((sum(col("dmicro")).cast("double") / count(lit(1)) / lit(1e6))
        .as("seasonal"))
    b.join(broadcast(se), "dow")
      .select(col("day"), col("rev"), col("trend"), col("seasonal"),
        (col("detr") - col("seasonal")).as("residual"))
      .orderBy(col("day"))
  }

  /** Cross-correlation between the BUILDING and AUTOMOBILE segments'
    * daily revenue at positional lags −7..+7 — does one segment lead
    * the other? Both series come out of ONE conditional aggregate
    * (no two filtered scans), all 15 lags out of one window pass
    * (LEAD/LAG over the day-aligned pair series — qAutocorr's
    * explode-the-lags shape, never 15 self-joins), and each lag's
    * correlation derives from exact-decimal moment sums, so only the
    * final one-row-per-lag formula is float → ROUND(6). */
  val qCrossCorr: QDef = {
    val lags = (-7 to 7).filter(_ != 0)
    def leadSql(k: Int): String =
      if (k >= 0) s"LEAD(y, $k) OVER (ORDER BY day) AS yl_$k"
      else s"LAG(y, ${-k}) OVER (ORDER BY day) AS yl_m${-k}"
    def colName(k: Int): String = if (k >= 0) s"yl_$k" else s"yl_m${-k}"
    val armsSql = lags
      .map(k => s"SELECT $k AS lag, x, ${colName(k)} AS y FROM ld " +
        s"WHERE ${colName(k)} IS NOT NULL")
      .mkString("\n  UNION ALL\n  ")
    QDef(
      "q_cross_corr",
      s"""WITH m AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    SUM(CASE WHEN c_mktsegment = 'BUILDING'
         |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS x,
         |    SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
         |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS y
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
         |  GROUP BY 1),
         |p AS (SELECT day, x, y FROM m
         |      WHERE x IS NOT NULL AND y IS NOT NULL),
         |ld AS (
         |  SELECT day, x,
         |    ${lags.map(leadSql).mkString(",\n    ")}
         |  FROM p),
         |pairs AS (
         |  $armsSql),
         |g AS (
         |  SELECT lag, CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
         |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
         |    CAST(SUM(y * y) AS DOUBLE) AS syy
         |  FROM pairs GROUP BY lag)
         |SELECT lag, CAST(n AS BIGINT) AS n,
         |  ROUND((n * sxy - sx * sy) /
         |    SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS ccf
         |FROM g ORDER BY lag""".stripMargin) { (s, d) =>
      val m = orders(s, d)
        .join(broadcast(customer(s, d)
          .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(
          sum(when(col("c_mktsegment") === "BUILDING",
            col("o_totalprice").cast("decimal(18,2)"))).as("x"),
          sum(when(col("c_mktsegment") === "AUTOMOBILE",
            col("o_totalprice").cast("decimal(18,2)"))).as("y"))
        .filter(col("x").isNotNull && col("y").isNotNull)
      val w = Window.orderBy(col("day"))
      val ld = m.select(
        col("day") +: col("x") +:
          lags.map(k =>
            (if (k >= 0) lead(col("y"), k) else lag(col("y"), -k))
              .over(w).as(colName(k))): _*)
      val pairs = ld
        .select(explode(array(lags.map(k =>
          struct(lit(k).as("lag"), col("x"),
            col(colName(k)).as("y"))): _*)).as("p"))
        .select(col("p.lag").as("lag"), col("p.x").as("x"),
          col("p.y").as("y"))
        .filter(col("y").isNotNull)
      pairs.groupBy(col("lag")).agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"))
        .select(col("lag"), col("n").cast("bigint").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("ccf"))
        .orderBy(col("lag"))
    }
  }

  /** Linear gap interpolation on the daily revenue series: days whose
    * day-of-month ≡ 2 or 5 (mod 7) are masked to NULL (a deterministic
    * synthetic outage covering ~2/7 of the series, including multi-day
    * runs), then each gap is filled by time-weighted linear
    * interpolation between its nearest known neighbours (IGNORE NULLS
    * running frames give prev/next value AND date, so unequal gap
    * spacing interpolates correctly); series edges fall back to the one
    * known side. The abs_err column scores the fill against the true
    * masked value. Calendar-bounded single-partition windows (the
    * qAutocorr shape); doubles enter via exact-decimal casts and every
    * engine computes the identical expression tree. */
  val qInterpolateLinear: QDef = QDef(
    "q_interpolate_linear",
    s"""WITH $dailyRevSql,
       |m AS (
       |  SELECT day, CAST(rev * 100 AS BIGINT) AS ac,
       |    CASE WHEN date_part('day', day) % 7 IN (2, 5) THEN NULL
       |      ELSE CAST(rev * 100 AS BIGINT) END AS vc
       |  FROM drev),
       |f AS (
       |  SELECT day, vc, ac,
       |    LAST_VALUE(vc IGNORE NULLS) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pvc,
       |    LAST_VALUE(CASE WHEN vc IS NOT NULL THEN day END IGNORE NULLS)
       |      OVER (ORDER BY day
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
       |    FIRST_VALUE(vc IGNORE NULLS) OVER (ORDER BY day
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nvc,
       |    FIRST_VALUE(CASE WHEN vc IS NOT NULL THEN day END IGNORE NULLS)
       |      OVER (ORDER BY day
       |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
       |  FROM m),
       |g AS (
       |  SELECT day, vc, ac,
       |    CASE WHEN vc IS NOT NULL THEN vc
       |      WHEN pvc IS NULL THEN nvc
       |      WHEN nvc IS NULL THEN pvc
       |      ELSE pvc + CAST(FLOOR(
       |        (2.0 * (nvc - pvc) * date_diff('day', pd, day)
       |          + date_diff('day', pd, nd))
       |        / (2 * date_diff('day', pd, nd))) AS BIGINT) END AS fc
       |  FROM f)
       |SELECT day,
       |  CAST(CASE WHEN vc IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap,
       |  fc / 100.0 AS filled,
       |  ABS(fc - ac) / 100.0 AS abs_err
       |FROM g ORDER BY day""".stripMargin) { (s, d) =>
    val cents = (col("rev") * 100).cast("bigint")
    val m = dailyRev(s, d).select(
      col("day"), cents.as("ac"),
      when(dayofmonth(col("day")) % 7 isin (2, 5), lit(null))
        .otherwise(cents).as("vc"))
    val wPrev = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.orderBy(col("day"))
      .rowsBetween(1, Window.unboundedFollowing)
    val knownDay = when(col("vc").isNotNull, col("day"))
    val f = m.select(col("day"), col("vc"), col("ac"),
      last(col("vc"), ignoreNulls = true).over(wPrev).as("pvc"),
      last(knownDay, ignoreNulls = true).over(wPrev).as("pd"),
      first(col("vc"), ignoreNulls = true).over(wNext).as("nvc"),
      first(knownDay, ignoreNulls = true).over(wNext).as("nd"))
    // half-up rounded integer division FLOOR((2n+d)/(2d)) keeps the
    // whole interpolation in exact cents: a double ROUND at 2dp hits
    // .xx5 midpoints constantly here (2-day gaps average two 2dp
    // values), and Spark HALF_UP vs DuckDB's banker-ish double round
    // diverge by a cent on every such tie
    val d1 = datediff(col("day"), col("pd"))
    val d2 = datediff(col("nd"), col("pd"))
    val fc = when(col("vc").isNotNull, col("vc"))
      .when(col("pvc").isNull, col("nvc"))
      .when(col("nvc").isNull, col("pvc"))
      .otherwise(col("pvc") + floor(
        (lit(2.0) * (col("nvc") - col("pvc")) * d1 + d2) /
          (lit(2) * d2)).cast("bigint"))
    f.select(col("day"), col("vc"), col("ac"), fc.as("fc"))
      .select(
        col("day"),
        when(col("vc").isNull, 1).otherwise(0).as("was_gap"),
        (col("fc") / lit(100.0)).as("filled"),
        (abs(col("fc") - col("ac")) / lit(100.0)).as("abs_err"))
      .orderBy(col("day"))
  }

  val defs: Seq[QDef] = Seq(qAutocorr, qTheilSen, qSeasonalNaive,
    qStlDecompose, qCrossCorr, qInterpolateLinear)
}
