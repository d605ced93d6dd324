package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Model-evaluation and distribution-monitoring operators — the
  * metrics layer of a training-data pipeline (evaluate a heuristic
  * scorer, watch for drift between corpus snapshots, compare cohort
  * distributions).
  *
  * Shared scale discipline: every metric here reduces the fact table
  * to a BOUNDED grouped distribution first (score values, bins), then
  * runs the order-sensitive pass (running sums, argmax) over that
  * small grouped result — never a global window over raw rows. AUC and
  * KS are EXACT under this grouping because the score is discrete;
  * PSI's bins are deciles of a baseline snapshot broadcast back.
  */
object MlEvalQueries {

  /** ROC AUC of l_quantity as a predictor of returnflag = 'R', via the
    * rank-sum identity restated over grouped score counts:
    * AUC = Σ_v pos(v) · (negBelow(v) + neg(v)/2) / (P·N) — ties get
    * the standard half credit. The window runs over ≤ 50 grouped rows.
    */
  val qAuc: QDef = QDef(
    "q_auc",
    """WITH g AS (
      |  SELECT l_quantity AS q,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS pos,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
      |      AS DOUBLE) AS neg
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT q, pos, neg,
      |    COALESCE(SUM(neg) OVER (ORDER BY q
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cumneg
      |  FROM g)
      |SELECT
      |  ROUND(SUM(pos * (cumneg + 0.5 * neg))
      |    / (SUM(pos) * SUM(neg)), 6) AS auc,
      |  CAST(SUM(pos) AS BIGINT) AS n_pos,
      |  CAST(SUM(neg) AS BIGINT) AS n_neg
      |FROM c
      |ORDER BY auc""".stripMargin) { (s, d) =>
    val g = lineitem(s, d)
      .groupBy(col("l_quantity").as("q"))
      .agg(
        sum(when(col("l_returnflag") === "R", 1).otherwise(0))
          .cast("double").as("pos"),
        sum(when(col("l_returnflag") === "R", 0).otherwise(1))
          .cast("double").as("neg"))
    val w = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cumneg", coalesce(sum(col("neg")).over(w), lit(0.0)))
      .agg(
        round(sum(col("pos") * (col("cumneg") + lit(0.5) * col("neg")))
          / (sum(col("pos")) * sum(col("neg"))), 6).as("auc"),
        sum(col("pos")).cast("bigint").as("n_pos"),
        sum(col("neg")).cast("bigint").as("n_neg"))
      .orderBy(col("auc"))
  }

  /** Population Stability Index between two corpus snapshots (1995 vs
    * 1996 orders) over DECILE bins of the baseline year: the drift
    * monitor that decides when a training mix must be rebuilt. The 9
    * interpolated boundaries are computed once and broadcast back;
    * bin id = count of boundaries ≤ price (the q_quantile_bucket
    * comparison-count pattern — no global sort of the fact rows).
    * Per-bin PSI terms are emitted (the global PSI is their sum) to
    * keep the output order-insensitive and the report actionable. */
  val qPsi: QDef = QDef(
    "q_psi",
    """WITH base AS (
      |  SELECT o_totalprice AS p FROM orders
      |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1995),
      |cur AS (
      |  SELECT o_totalprice AS p FROM orders
      |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996),
      |b AS (
      |  SELECT [quantile_cont(p, 0.1), quantile_cont(p, 0.2),
      |    quantile_cont(p, 0.3), quantile_cont(p, 0.4),
      |    quantile_cont(p, 0.5), quantile_cont(p, 0.6),
      |    quantile_cont(p, 0.7), quantile_cont(p, 0.8),
      |    quantile_cont(p, 0.9)] AS qs FROM base),
      |binned AS (
      |  SELECT src, len(list_filter(qs, x -> x <= p)) AS bin
      |  FROM (SELECT p, 'base' AS src FROM base
      |        UNION ALL SELECT p, 'cur' AS src FROM cur), b),
      |counts AS (
      |  SELECT bin,
      |    CAST(SUM(CASE WHEN src = 'base' THEN 1 ELSE 0 END) AS DOUBLE)
      |      AS nb,
      |    CAST(SUM(CASE WHEN src = 'cur' THEN 1 ELSE 0 END) AS DOUBLE)
      |      AS nc
      |  FROM binned GROUP BY bin),
      |tot AS (SELECT SUM(nb) AS tb, SUM(nc) AS tc FROM counts)
      |SELECT bin, ROUND(nb / tb, 6) AS p_base, ROUND(nc / tc, 6) AS p_cur,
      |  ROUND((nc / tc - nb / tb) * LN((nc / tc) / (nb / tb)), 6)
      |    AS psi_term
      |FROM counts, tot
      |ORDER BY bin""".stripMargin) { (s, d) =>
    val o = orders(s, d)
      .select(col("o_totalprice").as("p"),
        year(col("o_orderdate")).as("y"))
    val base = o.filter(col("y") === 1995).select("p")
    val cur = o.filter(col("y") === 1996).select("p")
    val qs = base.agg(expr(
      "percentile(p, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
      .as("qs"))
    val both = base.withColumn("src", lit("base"))
      .unionByName(cur.withColumn("src", lit("cur")))
    val counts = both.crossJoin(broadcast(qs))
      .withColumn("bin", expr(
        "aggregate(qs, 0, (acc, x) -> acc + CASE WHEN x <= p THEN 1 ELSE 0 END)"))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("src") === "base", 1).otherwise(0)).cast("double")
          .as("nb"),
        sum(when(col("src") === "cur", 1).otherwise(0)).cast("double")
          .as("nc"))
    val tot = counts.agg(
      sum(col("nb")).as("tb"), sum(col("nc")).as("tc"))
    counts.crossJoin(broadcast(tot))
      .select(
        col("bin"),
        round(col("nb") / col("tb"), 6).as("p_base"),
        round(col("nc") / col("tc"), 6).as("p_cur"),
        round((col("nc") / col("tc") - col("nb") / col("tb"))
          * log((col("nc") / col("tc")) / (col("nb") / col("tb"))), 6)
          .as("psi_term"))
      .orderBy(col("bin"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the l_quantity
    * distributions of returned ('R') vs accepted ('N') line items:
    * D = max over score values of |CDF_R − CDF_N|, with the argmax
    * value reported (smallest value on ties — total order). Exact:
    * the score is discrete, so grouped counts + running sums over ≤ 50
    * rows reproduce both empirical CDFs without a raw-row sort. */
  val qKsTest: QDef = QDef(
    "q_ks_test",
    """WITH g AS (
      |  SELECT l_quantity AS q,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS nr,
      |    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS nn
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
      |c AS (
      |  SELECT q,
      |    SUM(nr) OVER (ORDER BY q) / SUM(nr) OVER () AS cdf_r,
      |    SUM(nn) OVER (ORDER BY q) / SUM(nn) OVER () AS cdf_n
      |  FROM g)
      |SELECT ROUND(ABS(cdf_r - cdf_n), 6) AS ks, q AS at_q
      |FROM c
      |ORDER BY ABS(cdf_r - cdf_n) DESC, q
      |LIMIT 1""".stripMargin) { (s, d) =>
    val g = lineitem(s, d)
      .filter(col("l_returnflag").isin("R", "N"))
      .groupBy(col("l_quantity").as("q"))
      .agg(
        sum(when(col("l_returnflag") === "R", 1).otherwise(0))
          .cast("double").as("nr"),
        sum(when(col("l_returnflag") === "N", 1).otherwise(0))
          .cast("double").as("nn"))
    val wCum = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    g.select(col("q"),
        (sum(col("nr")).over(wCum) / sum(col("nr")).over(wAll))
          .as("cdf_r"),
        (sum(col("nn")).over(wCum) / sum(col("nn")).over(wAll))
          .as("cdf_n"))
      .select(round(abs(col("cdf_r") - col("cdf_n")), 6).as("ks"),
        col("q").as("at_q"),
        abs(col("cdf_r") - col("cdf_n")).as("raw"))
      .orderBy(col("raw").desc, col("at_q"))
      .limit(1)
      .drop("raw")
  }

  /** Kaplan–Meier survival curve for time-to-first-purchase with
    * right-censoring (users who never purchase exit at the study end
    * as censored, NOT as failures — dropping them would bias the curve
    * down). S(t) = Π(1 − dᵢ/nᵢ) computed as EXP of a running LN sum
    * over the day-grouped endpoint table (bounded rows: one per
    * distinct endpoint day), with the terminal day — everyone
    * remaining exits — pinned to 0 explicitly (LN(0) is an error in
    * DuckDB and −Inf in Spark). The churn/conversion-curve operator. */
  val qSurvivalKm: QDef = QDef(
    "q_survival_km",
    """WITH u AS (
      |  SELECT user_id, MIN(ts) AS first_seen,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
      |  FROM events GROUP BY user_id),
      |study AS (SELECT MAX(ts) AS study_end FROM events),
      |d AS (
      |  SELECT CASE WHEN fp IS NOT NULL
      |      THEN date_diff('day', first_seen, fp)
      |      ELSE date_diff('day', first_seen, study_end) END AS day,
      |    CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM u, study),
      |g AS (
      |  SELECT day, CAST(SUM(ev) AS DOUBLE) AS d_n,
      |    CAST(COUNT(*) AS DOUBLE) AS out_n
      |  FROM d GROUP BY day),
      |k AS (
      |  SELECT day, d_n,
      |    (SELECT SUM(out_n) FROM g) -
      |      COALESCE(SUM(out_n) OVER (ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS n_risk
      |  FROM g)
      |SELECT day, CAST(d_n AS BIGINT) AS d,
      |  CAST(n_risk AS BIGINT) AS n_risk,
      |  CASE WHEN d_n >= n_risk THEN 0.0 ELSE
      |    ROUND(EXP(SUM(CASE WHEN d_n < n_risk
      |      THEN LN(1 - d_n / n_risk) END) OVER (ORDER BY day)), 6)
      |  END AS surv
      |FROM k
      |ORDER BY day""".stripMargin) { (s, d) =>
    val u = events(s, d)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_seen"),
        min(when(col("event_type") === "purchase", col("ts"))).as("fp"))
    val study = events(s, d).agg(max(col("ts")).as("study_end"))
    val endpoints = u.crossJoin(broadcast(study))
      .select(
        when(col("fp").isNotNull,
          datediff(col("fp"), col("first_seen")))
          .otherwise(datediff(col("study_end"), col("first_seen")))
          .as("day"),
        when(col("fp").isNotNull, 1).otherwise(0).as("ev"))
    val g = endpoints.groupBy(col("day"))
      .agg(sum(col("ev")).cast("double").as("d_n"),
        count(lit(1)).cast("double").as("out_n"))
    val wPrev = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("day")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("n_risk",
        sum(col("out_n")).over(wAll)
          - coalesce(sum(col("out_n")).over(wPrev), lit(0.0)))
      .select(col("day"), col("d_n").cast("bigint").as("d"),
        col("n_risk").cast("bigint").as("n_risk"),
        when(col("d_n") >= col("n_risk"), 0.0)
          .otherwise(round(exp(sum(when(col("d_n") < col("n_risk"),
            log(lit(1.0) - col("d_n") / col("n_risk")))).over(wCum)), 6))
          .as("surv"))
      .orderBy(col("day"))
  }

  val defs: Seq[QDef] = Seq(qAuc, qPsi, qKsTest, qSurvivalKm)
}
