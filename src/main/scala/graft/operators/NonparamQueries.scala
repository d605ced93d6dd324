package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Nonparametric / rank-based statistics over the relational core:
  * Mann–Whitney rank-sum test, Spearman rank correlation, weighted
  * median, and the Wald–Wolfowitz runs test — the distribution-free
  * diagnostics a pipeline reaches for when normality can't be assumed
  * (A/B outcomes with heavy tails, robust central tendency for skewed
  * price data, randomness checks on a KPI series).
  *
  * Scale shapes: every rank window runs over a CALENDAR-BOUNDED
  * day-grain pre-aggregate (≤ ~36 500 rows/century regardless of fact
  * rows — the same serial-window contract as q_rolling_corr) or a
  * VALUE-GRAIN pre-aggregate (weighted median ranks distinct prices,
  * not fact rows). The fact-table pass is always one partial+final
  * hash aggregate.
  *
  * Float determinism: average ranks are half-integers and their sums
  * stay EXACTLY representable in double (quarters/halves below 2^51),
  * so rank statistics carry no accumulation-order seam at all; final
  * z/ρ formulas run the identical IEEE sequence on both engines and
  * round only for the rendering.
  */
object NonparamQueries {

  /** Day-grain revenue split by order-priority class — the shared
    * two-sample frame for the rank tests. */
  private def dailyRevByArm(s: org.apache.spark.sql.SparkSession,
      d: String) =
    orders(s, d)
      .groupBy(
        to_date(col("o_orderdate")).as("day"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hi")
          .otherwise("lo").as("arm"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").as("rev"))

  /** Mann–Whitney U (Wilcoxon rank-sum) test: do high-priority days
    * bring different revenue than low-priority days? Average ranks
    * handle ties (RANK() + (peers−1)/2 — the textbook midrank), U
    * derives from the hi-arm rank sum, and the normal approximation
    * z uses the untied variance (the day-grain DECIMAL revenue sums
    * make exact ties measure-zero; midranks keep even those cases
    * deterministic). Rank sums are sums of half-integers — exact in
    * double at any accumulation order, so U carries no float seam. */
  val qMannwhitneyU: QDef = QDef(
    "q_mannwhitney_u",
    """WITH m AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 'hi' ELSE 'lo' END AS arm,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS rev
      |  FROM orders GROUP BY 1, 2),
      |r AS (
      |  SELECT arm,
      |    RANK() OVER (ORDER BY rev)
      |      + (COUNT(*) OVER (PARTITION BY rev) - 1) / 2.0 AS rk
      |  FROM m),
      |g AS (
      |  SELECT
      |    SUM(CASE WHEN arm = 'hi' THEN rk END) AS r_hi,
      |    SUM(CASE WHEN arm = 'hi' THEN 1 ELSE 0 END) AS n_hi,
      |    SUM(CASE WHEN arm = 'lo' THEN 1 ELSE 0 END) AS n_lo
      |  FROM r)
      |SELECT CAST(n_hi AS BIGINT) AS n_hi, CAST(n_lo AS BIGINT) AS n_lo,
      |  ROUND(r_hi - n_hi * (n_hi + 1) / 2.0, 1) AS u_stat,
      |  ROUND((r_hi - n_hi * (n_hi + 1) / 2.0 - n_hi * n_lo / 2.0)
      |    / SQRT(n_hi * 1.0 * n_lo * (n_hi + n_lo + 1) / 12.0), 4)
      |    AS z
      |FROM g""".stripMargin) { (s, d) =>
    val ranked = dailyRevByArm(s, d).select(
      col("arm"),
      (rank().over(Window.orderBy(col("rev")))
        + (count(lit(1)).over(Window.partitionBy(col("rev"))) - 1) / 2.0)
        .as("rk"))
    val u = col("r_hi") - col("n_hi") * (col("n_hi") + 1) / 2.0
    ranked
      .agg(
        sum(when(col("arm") === "hi", col("rk"))).as("r_hi"),
        sum(when(col("arm") === "hi", 1).otherwise(0)).as("n_hi"),
        sum(when(col("arm") === "lo", 1).otherwise(0)).as("n_lo"))
      .select(
        col("n_hi"), col("n_lo"),
        round(u, 1).as("u_stat"),
        round((u - col("n_hi") * col("n_lo") / 2.0)
          / sqrt(col("n_hi") * lit(1.0) * col("n_lo")
            * (col("n_hi") + col("n_lo") + 1) / 12.0), 4).as("z"))
  }

  /** Spearman rank correlation between daily order volume and daily
    * revenue. Midranks on both axes, then the closed-form Pearson of
    * the ranks from five EXACT sums (Σrx, Σry, Σrx², Σry², Σrx·ry are
    * quarter-integer sums ≤ ~2^45 — exactly representable at any
    * accumulation order, unlike CORR's streaming moments), so the
    * only float work is the final one-row formula. */
  val qSpearmanCorr: QDef = QDef(
    "q_spearman_corr",
    """WITH m AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS rev
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT
      |    RANK() OVER (ORDER BY n_orders)
      |      + (COUNT(*) OVER (PARTITION BY n_orders) - 1) / 2.0 AS rx,
      |    RANK() OVER (ORDER BY rev)
      |      + (COUNT(*) OVER (PARTITION BY rev) - 1) / 2.0 AS ry
      |  FROM m),
      |g AS (
      |  SELECT COUNT(*) AS n, SUM(rx) AS sx, SUM(ry) AS sy,
      |    SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
      |    SUM(rx * ry) AS sxy
      |  FROM r)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  ROUND((n * sxy - sx * sy)
      |    / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
      |    AS rho
      |FROM g""".stripMargin) { (s, d) =>
    val m = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("rev"))
    val r = m.select(
      (rank().over(Window.orderBy(col("n_orders")))
        + (count(lit(1)).over(Window.partitionBy(col("n_orders"))) - 1)
          / 2.0).as("rx"),
      (rank().over(Window.orderBy(col("rev")))
        + (count(lit(1)).over(Window.partitionBy(col("rev"))) - 1) / 2.0)
        .as("ry"))
    r.agg(
        count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
      .select(
        col("n").as("n_days"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("rho"))
  }

  /** Quantity-weighted median line price per return flag — the robust
    * "typical transaction price" (an outlier order of 10 000 units
    * moves a mean; it moves a weighted median one rank). Pre-aggregate
    * to (flag, price) grain first, so the per-flag cumulative window
    * ranks DISTINCT PRICES (bounded by the price domain), not fact
    * rows; weights accumulate in exact DECIMAL and the median pick
    * (first price whose doubled cumulative weight reaches the total)
    * is an exact decimal comparison — no float anywhere until the
    * final rendering cast.
    *
    * The cumulative weight is a TWO-LEVEL prefix sum (the q_shard_pack
    * shape): fixed 2048-wide price bands give (flag, band) subtotals,
    * a tiny window over the ≤ |flags|·64-row band table assigns
    * exclusive band offsets, and the per-price window runs PARTITIONED
    * BY (flag, band). The textbook PARTITION BY flag window serializes
    * each flag's entire price domain through one task — with 3 flags
    * that is a 3-task stage no matter how many executors exist (2.1 s
    * → 0.7 s even at sf0.1; at 100 TB it is the difference between a
    * parallel stage and three straggler tasks). */
  val qWeightedMedian: QDef = QDef(
    "q_weighted_median",
    """WITH g AS (
      |  SELECT l_returnflag AS flag, l_extendedprice AS price,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT flag, price, w,
      |    SUM(w) OVER (PARTITION BY flag ORDER BY price) AS cw,
      |    SUM(w) OVER (PARTITION BY flag) AS tw
      |  FROM g)
      |SELECT flag, CAST(MIN(price) AS DOUBLE) AS wmedian,
      |  CAST(MAX(tw) AS DOUBLE) AS total_w
      |FROM c WHERE 2 * cw >= tw
      |GROUP BY flag
      |ORDER BY flag""".stripMargin) { (s, d) =>
    // (flag, price) grain is bounded by the price domain (~55 k rows
    // per flag at any SF), but it has THREE consumers (band offsets,
    // per-flag totals, the banded cumsum) and each would re-run the
    // final aggregate + its own subtree above the reused shuffle stage
    // (r14 opt: plans/r14/q_weighted_median_*.txt — 3 scan+agg passes
    // in the executed plan, only the exchanges reused). One eager
    // materialization of the small grain feeds all three: 2.67 s ->
    // ~1.1 s at sf0.1, and at 100 TB one fact pass instead of three.
    // r15 opt (verdict item 5): the ~550 k-group grain aggregate
    // accumulates LONG CENTS instead of DECIMAL(18,2). Exactness: the
    // per-row value is cast(l_quantity as decimal(18,2)) * 100 — the
    // IDENTICAL half-up 2-dp quantization the decimal sum consumed —
    // and a sum of those integers in Long equals the decimal sum
    // scaled by 100 (fixture quantities are integral 1..50, so even
    // 100 TB of rows stays ~3e16 ≪ 2^63; ANSI sum would throw, not
    // wrap, beyond that). Every downstream comparison (2·cw ≥ tw) is
    // scale-invariant, and the one decimal-valued output (total_w)
    // converts back through an exact decimal divide, so the rendered
    // doubles are bit-identical to the decimal pipeline's.
    val g = lineitem(s, d)
      .groupBy(
        col("l_returnflag").as("flag"),
        col("l_extendedprice").as("price"))
      .agg(sum((col("l_quantity").cast("decimal(18,2)") * 100)
        .cast("long")).as("w"))
      .withColumn("band", floor(col("price") / 2048).cast("int"))
      .localCheckpoint()
    // TWO-LEVEL SELECTION, completed (r14 opt): the r5 shape banded
    // the prefix sum but still ran the cumulative window over EVERY
    // grain row. The median price can only live in the FIRST band
    // whose inclusive cumulative weight reaches tw/2 (bands before it
    // have 2·cum < tw for all their prices; that band's last price
    // has 2·cum ≥ tw), so only the ~1/64 grain slice of that one band
    // per flag needs the within-band cumsum — the same
    // rank-to-partition pruning q_theil_sen's lowMedian does. Exact:
    // decimal comparisons only, same cw values on the surviving rows.
    // 2.16 s -> ~1.35 s at sf0.1; at 100 TB the window input drops
    // from the full price grain to one band per flag.
    val bands = g.groupBy(col("flag"), col("band"))
      .agg(sum(col("w")).as("bw"))
      .withColumn(
        "cum",
        sum(col("bw")).over(
          Window.partitionBy(col("flag")).orderBy(col("band"))))
    val tot = bands.groupBy(col("flag")).agg(max(col("cum")).as("tw"))
    // first band per flag with 2·cum ≥ tw, carrying its exclusive
    // offset (cum − bw) and tw; min(struct) picks the lowest band
    val target = bands.join(broadcast(tot), "flag")
      .where(col("cum") * 2 >= col("tw"))
      .groupBy(col("flag"))
      .agg(min(struct(col("band"), col("cum"), col("bw"), col("tw")))
        .as("t"))
      .select(col("flag"), col("t.band").as("band"),
        (col("t.cum") - col("t.bw")).as("boff"), col("t.tw").as("tw"))
    val inner = Window.partitionBy(col("flag"), col("band"))
      .orderBy(col("price"))
    g.join(broadcast(target), Seq("flag", "band"))
      .withColumn("cw", col("boff") + sum(col("w")).over(inner))
      .where(col("cw") * 2 >= col("tw"))
      .groupBy(col("flag"))
      .agg(
        min(col("price")).cast("double").as("wmedian"),
        // cents → exact decimal units → double: decimal(38,0)/100 has
        // scale ≥ 2, so the quotient is EXACT, and the final cast is
        // the same correctly-rounded decimal→double the old pipeline
        // performed on its decimal tw
        (max(col("tw")).cast("decimal(38,0)") / 100).cast("double")
          .as("total_w"))
      .orderBy(col("flag"))
  }

  /** Wald–Wolfowitz runs test on the daily revenue series: is
    * above-/below-median sign an independent coin flip, or does the
    * series trend/mean-revert? The reference level is the LOWER
    * median (row (n+1)÷2 in rank order — pure integer selection, no
    * interpolation seam), signs come from exact decimal compares, the
    * run count is one lag pass over the calendar-bounded series, and
    * the z statistic is integer-ratio arithmetic → identical IEEE on
    * both engines. */
  val qRunsTest: QDef = QDef(
    "q_runs_test",
    """WITH m AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |med AS (
      |  SELECT rev AS med FROM (
      |    SELECT rev, ROW_NUMBER() OVER (ORDER BY rev) AS rn,
      |      COUNT(*) OVER () AS n
      |    FROM m) WHERE rn = (n + 1) // 2),
      |sgn AS (
      |  SELECT day, CASE WHEN rev > med THEN 1 ELSE 0 END AS s
      |  FROM m CROSS JOIN med),
      |runs AS (
      |  SELECT s,
      |    CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
      |      OR s <> LAG(s) OVER (ORDER BY day)
      |      THEN 1 ELSE 0 END AS chg
      |  FROM sgn),
      |g AS (
      |  SELECT COUNT(*) AS n, SUM(s) AS n1,
      |    COUNT(*) - SUM(s) AS n2, SUM(chg) AS r
      |  FROM runs)
      |SELECT CAST(n AS BIGINT) AS n_days, CAST(n1 AS BIGINT) AS n_above,
      |  CAST(n2 AS BIGINT) AS n_below, CAST(r AS BIGINT) AS runs,
      |  ROUND((r - (2.0 * n1 * n2 / n + 1))
      |    / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
      |      / (1.0 * n * n * (n - 1))), 4) AS z
      |FROM g""".stripMargin) { (s, d) =>
    val m = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val med = m
      .select(col("rev"),
        row_number().over(Window.orderBy(col("rev"))).as("rn"),
        count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)).as("n"))
      .where(col("rn") === floor((col("n") + 1) / 2))
      .select(col("rev").as("med"))
    val byDay = Window.orderBy(col("day"))
    val sgn = m.crossJoin(broadcast(med))
      .select(col("day"),
        when(col("rev") > col("med"), 1).otherwise(0).as("s"))
    val runs = sgn.select(col("s"),
      when(lag(col("s"), 1).over(byDay).isNull
        || col("s") =!= lag(col("s"), 1).over(byDay), 1)
        .otherwise(0).as("chg"))
    val mu = lit(2.0) * col("n1") * col("n2") / col("n") + 1
    runs
      .agg(
        count(lit(1)).as("n"), sum(col("s")).as("n1"),
        (count(lit(1)) - sum(col("s"))).as("n2"),
        sum(col("chg")).as("r"))
      .select(
        col("n").as("n_days"), col("n1").as("n_above"),
        col("n2").as("n_below"), col("r").as("runs"),
        round((col("r") - mu)
          / sqrt(lit(2.0) * col("n1") * col("n2")
            * (lit(2.0) * col("n1") * col("n2") - col("n"))
            / (lit(1.0) * col("n") * col("n") * (col("n") - 1))), 4)
          .as("z"))
  }

  /** Kendall tau-b rank correlation between per-nation mean account
    * balance and customer count: the concordant/discordant pair count
    * with the tie-corrected denominator. The pair join is quadratic IN
    * NATIONS ONLY (25 rows → 300 pairs — a broadcast self-join over a
    * pre-aggregated table that never grows with the data); the mean
    * balance derives from an EXACT decimal sum divided by the count, so
    * both engines compare bit-identical doubles and the
    * concordant/discordant signs can never flip cross-engine. */
  val qKendallTau: QDef = QDef(
    "q_kendall_tau",
    """WITH a AS (
      |  SELECT c_nationkey AS k,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |      / COUNT(*) AS x,
      |    COUNT(*) AS y
      |  FROM customer GROUP BY 1),
      |p AS (
      |  SELECT s.x AS x1, s.y AS y1, t.x AS x2, t.y AS y2
      |  FROM a s JOIN a t ON s.k < t.k),
      |c AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN (x1 - x2) * (y1 - y2) > 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS nc,
      |    CAST(SUM(CASE WHEN (x1 - x2) * (y1 - y2) < 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS nd,
      |    CAST(SUM(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS tx,
      |    CAST(SUM(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ty,
      |    CAST(COUNT(*) AS BIGINT) AS n0
      |  FROM p)
      |SELECT nc AS concordant, nd AS discordant,
      |  ROUND((nc - nd) * 1.0
      |    / SQRT((n0 - tx) * 1.0 * (n0 - ty)), 6) + 0.0 AS tau_b
      |FROM c""".stripMargin) { (s, d) =>
    val a = customer(s, d).groupBy(col("c_nationkey").as("k"))
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("x"), count(lit(1)).as("y"))
    val b = a.select(col("k").as("k2"), col("x").as("x2"),
      col("y").as("y2"))
    val p = a.join(broadcast(b), col("k") < col("k2"))
      .select(col("x").as("x1"), col("y").as("y1"), col("x2"),
        col("y2"))
    val prod = (col("x1") - col("x2")) * (col("y1") - col("y2"))
    val c = p.agg(
      sum(when(prod > 0, 1L).otherwise(0L)).as("nc"),
      sum(when(prod < 0, 1L).otherwise(0L)).as("nd"),
      sum(when(col("x1") === col("x2"), 1L).otherwise(0L)).as("tx"),
      sum(when(col("y1") === col("y2"), 1L).otherwise(0L)).as("ty"),
      count(lit(1)).as("n0"))
    c.select(col("nc").as("concordant"), col("nd").as("discordant"),
      (round((col("nc") - col("nd")) * lit(1.0) /
        sqrt((col("n0") - col("tx")) * lit(1.0) *
          (col("n0") - col("ty"))), 6) + lit(0.0)).as("tau_b"))
  }

  val defs: Seq[QDef] = Seq(
    qMannwhitneyU, qSpearmanCorr, qWeightedMedian, qRunsTest,
    qKendallTau)
}
