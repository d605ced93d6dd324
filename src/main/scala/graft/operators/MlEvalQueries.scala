package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Per-class confusion-matrix metrics (precision / recall / F1) for
    * a threshold classifier of event_type from the event value. ONE
    * pass builds the ≤ classes² confusion matrix; each cm cell then
    * fans out into its TWO class contributions (actual-side tp/fn,
    * predicted-side fp) so the per-class rollup reads the tiny cm once
    * — the naive per-class branches would rescan the fact table three
    * times. All metrics are ratios of BIGINT counts → ROUND(6) is a
    * rendering seam only. */
  val qConfusionMetrics: QDef = {
    val predCase =
      """CASE WHEN value >= 80 THEN 'purchase'
        |      WHEN value >= 60 THEN 'click'
        |      WHEN value >= 40 THEN 'view'
        |      WHEN value >= 20 THEN 'signup'
        |      ELSE 'error' END""".stripMargin
    QDef(
      "q_confusion_metrics",
      s"""WITH cm AS (
         |  SELECT event_type AS a, $predCase AS p, COUNT(*) AS n
         |  FROM events GROUP BY 1, 2),
         |c AS (
         |  SELECT a AS cls,
         |    SUM(CASE WHEN a = p THEN n ELSE 0 END) AS tp,
         |    0 AS fp,
         |    SUM(CASE WHEN a <> p THEN n ELSE 0 END) AS fn
         |  FROM cm GROUP BY 1
         |  UNION ALL
         |  SELECT p, 0, SUM(CASE WHEN a <> p THEN n ELSE 0 END), 0
         |  FROM cm GROUP BY 1),
         |g AS (
         |  SELECT cls, CAST(SUM(tp) AS BIGINT) AS tp,
         |    CAST(SUM(fp) AS BIGINT) AS fp,
         |    CAST(SUM(fn) AS BIGINT) AS fn
         |  FROM c GROUP BY 1)
         |SELECT cls, tp, fp, fn,
         |  ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS prec,
         |  ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS rec,
         |  ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1
         |FROM g ORDER BY cls""".stripMargin) { (s, d) =>
      val cm = events(s, d)
        .groupBy(col("event_type").as("a"), expr(predCase).as("p"))
        .agg(count(lit(1)).as("n"))
      cm.select(explode(array(
          struct(col("a").as("cls"),
            when(col("a") === col("p"), col("n")).otherwise(0L).as("tp"),
            lit(0L).as("fp"),
            when(col("a") =!= col("p"), col("n")).otherwise(0L).as("fn")),
          struct(col("p").as("cls"), lit(0L).as("tp"),
            when(col("a") =!= col("p"), col("n")).otherwise(0L).as("fp"),
            lit(0L).as("fn")))).as("x"))
        .groupBy(col("x.cls").as("cls"))
        .agg(sum(col("x.tp")).as("tp"), sum(col("x.fp")).as("fp"),
          sum(col("x.fn")).as("fn"))
        .select(col("cls"), col("tp"), col("fp"), col("fn"),
          round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
            .as("prec"),
          round(col("tp").cast("double") / (col("tp") + col("fn")), 6)
            .as("rec"),
          round((col("tp") * 2).cast("double")
            / (col("tp") * 2 + col("fp") + col("fn")), 6).as("f1"))
        .orderBy(col("cls"))
    }
  }

  /** Mean reciprocal rank of the first purchase in each user's
    * value-ranked event list. Per-user reciprocal ranks are quantized
    * to integer femto-units (FLOOR(1e15/k) — k is a small integer, the
    * double divide is bit-identical cross-engine) so the cross-user
    * mean is a primitive-long sum: exact and order-independent where a
    * double Σ(1/k) over 100k users would wobble with aggregation
    * order. One window pass + one agg; no shuffle beyond the user
    * partitioning. */
  val qMrr: QDef = QDef(
    "q_mrr",
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id) AS rn
      |  FROM events),
      |k AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'purchase' THEN rn END) AS k
      |  FROM r GROUP BY 1)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |  ROUND(CAST(SUM(CAST(FLOOR(1e15 / k) AS BIGINT)) AS DOUBLE)
      |    / 1e15 / COUNT(*), 6) AS mrr
      |FROM k WHERE k IS NOT NULL
      |ORDER BY n_users""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_type"),
        row_number().over(byUser).as("rn"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase", col("rn"))).as("k"))
      .filter(col("k").isNotNull)
      .agg(count(lit(1)).as("n_users"),
        round(sum(floor(lit(1e15) / col("k")).cast("bigint"))
          .cast("double") / lit(1e15) / count(lit(1)), 6).as("mrr"))
      .orderBy(col("n_users"))
  }

  /** NDCG@10 of the value-ranked event list against purchase
    * relevance, averaged over users with ≥ 1 purchase in their top
    * 10. The 1/log2(pos+1) discounts are INTEGER micro-unit literals
    * (identical on both engines — no transcendental evaluated at query
    * time), so per-user DCG and ideal DCG are exact BIGINTs; only the
    * final dcg/idcg ratio is a double, quantized to pico-units before
    * the cross-user mean for order-independence. */
  val qNdcg: QDef = {
    val w = Seq(1000000L, 630929L, 500000L, 430676L, 386852L, 356207L,
      333333L, 315464L, 301029L, 289064L)
    val cum = w.scanLeft(0L)(_ + _).tail
    val wCase = (1 to 10).map(i => s"WHEN ${i} THEN ${w(i - 1)}")
      .mkString("CASE rn ", " ", " ELSE 0 END")
    val idcgCase = (1 to 10).map(i => s"WHEN ${i} THEN ${cum(i - 1)}")
      .mkString("CASE npos ", " ", " ELSE 0 END")
    QDef(
      "q_ndcg",
      s"""WITH r AS (
         |  SELECT user_id,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY value DESC, event_id) AS rn
         |  FROM events),
         |u AS (
         |  SELECT user_id,
         |    SUM(rel * ($wCase)) AS dcg,
         |    SUM(rel) AS npos
         |  FROM r WHERE rn <= 10 GROUP BY 1),
         |q AS (
         |  SELECT CAST(FLOOR(CAST(dcg AS DOUBLE) / ($idcgCase) * 1e12)
         |    AS BIGINT) AS nq
         |  FROM u WHERE npos >= 1)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         |  ROUND(CAST(SUM(nq) AS DOUBLE) / 1e12 / COUNT(*), 6)
         |    AS mean_ndcg10,
         |  ROUND(CAST(SUM(CASE WHEN nq = 1000000000000 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / COUNT(*), 6) AS perfect_share
         |FROM q ORDER BY n_users""".stripMargin) { (s, d) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      events(s, d)
        .select(col("user_id"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("rel"),
          row_number().over(byUser).as("rn"))
        .filter(col("rn") <= 10)
        .groupBy(col("user_id"))
        .agg(sum(col("rel") * expr(wCase)).as("dcg"),
          sum(col("rel")).as("npos"))
        .filter(col("npos") >= 1)
        .select(floor(col("dcg").cast("double") / expr(idcgCase)
          * lit(1e12)).cast("bigint").as("nq"))
        .agg(count(lit(1)).as("n_users"),
          round(sum(col("nq")).cast("double") / lit(1e12)
            / count(lit(1)), 6).as("mean_ndcg10"),
          round(sum(when(col("nq") === 1000000000000L, 1).otherwise(0))
            .cast("double") / count(lit(1)), 6).as("perfect_share"))
        .orderBy(col("n_users"))
    }
  }

  /** Calibration / reliability bins for a [0,1] score (the capped
    * normalized event value) against purchase outcome: per decile bin,
    * support, mean predicted score, and observed positive rate. Mean
    * score is an integer micro-unit sum (FLOOR-quantized per row) so
    * the per-bin aggregate is exact under any accumulation order; the
    * positive rate is a BIGINT ratio. Single partial+final agg to 10
    * rows. */
  val qCalibrationBins: QDef = QDef(
    "q_calibration_bins",
    """WITH s AS (
      |  SELECT LEAST(value / 600, CAST(1.0 AS DOUBLE)) AS p,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |b AS (
      |  SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin,
      |    CAST(FLOOR(p * 1e6) AS BIGINT) AS pq, y
      |  FROM s)
      |SELECT CAST(bin AS INT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
      |  ROUND(CAST(SUM(pq) AS DOUBLE) / 1e6 / COUNT(*), 6)
      |    AS mean_score,
      |  ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate
      |FROM b GROUP BY bin
      |ORDER BY bin""".stripMargin) { (s, d) =>
    // ONE binning implementation feeds both the oracle-pinned report
    // and the isotonic calibrator — the round only happens here, at
    // the rendering seam
    calibrationBins(s, d)
      .select(col("bin"), col("n"),
        round(col("mean_score"), 6).as("mean_score"),
        round(col("pos_rate"), 6).as("pos_rate"))
      .orderBy(col("bin"))
  }

  /** The reliability-diagram bins of qCalibrationBins, as a reusable
    * frame: (bin, n, mean_score, pos_rate) — exact integer-quantized
    * aggregation, 10 rows. */
  private def calibrationBins(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(least(col("value") / 600, lit(1.0)).as("p"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("y"))
      .select(least(floor(col("p") * 10).cast("int"), lit(9)).as("bin"),
        floor(col("p") * lit(1e6)).cast("bigint").as("pq"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        (sum(col("pq")).cast("double") / lit(1e6) / count(lit(1)))
          .as("mean_score"),
        (sum(col("y")).cast("double") / count(lit(1))).as("pos_rate"))

  /** Isotonic (PAV) calibration of the reliability diagram — the
    * post-hoc calibrator every scored-model pipeline fits after the
    * binned diagnostic: Spark ML's IsotonicRegression pools adjacent
    * violating bins (weighted by bin size) into a monotone
    * non-decreasing mapping score → calibrated rate. The model fits
    * over 10 pre-aggregated rows — the 100 TB scan cost is the
    * binning aggregate, not the fit.
    *
    * Oracle (round 10; previously no_oracle): over n ordered points
    * PAV's solution has the closed minimax form fitted(i) =
    * max,,j≤i,, min,,k≥i,, weightedMean(pos_rate over bins j..k) —
    * O(n³) joins, trivial for the 10 fixed bins, and the segment
    * means multiply pos_rate×n exactly like Spark ML's weighted
    * pooling, so the 6dp-rounded outputs agree bit-for-bit. The PAV
    * algebra itself is now under the driver hash gate;
    * IsotonicCalibrationSpec keeps the independent textbook-PAV lens
    * (equality, monotonicity, weighted-mean preservation). */
  val qCalibrationIsotonic: QDef = QDef(
    "q_calibration_isotonic",
    """WITH s AS (
      |  SELECT LEAST(value / 600, CAST(1.0 AS DOUBLE)) AS p,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |bq AS (
      |  SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin,
      |    CAST(FLOOR(p * 1e6) AS BIGINT) AS pq, y
      |  FROM s),
      |bins AS (
      |  SELECT bin, COUNT(*) AS n,
      |    CAST(SUM(pq) AS DOUBLE) / 1e6 / COUNT(*) AS mean_score,
      |    CAST(SUM(y) AS DOUBLE) / COUNT(*) AS pos_rate
      |  FROM bq GROUP BY bin),
      |seg AS (
      |  SELECT j.bin AS j, k.bin AS k,
      |    SUM(m.pos_rate * m.n) / SUM(m.n) AS avgv
      |  FROM bins j JOIN bins k ON j.bin <= k.bin
      |  JOIN bins m ON m.bin BETWEEN j.bin AND k.bin
      |  GROUP BY j.bin, k.bin),
      |inmin AS (
      |  SELECT i.bin AS bin, sg.j AS j, MIN(sg.avgv) AS v
      |  FROM bins i JOIN seg sg ON sg.j <= i.bin AND sg.k >= i.bin
      |  GROUP BY i.bin, sg.j),
      |fit AS (SELECT bin, MAX(v) AS iso FROM inmin GROUP BY bin)
      |SELECT CAST(b.bin AS INT) AS bin, CAST(b.n AS BIGINT) AS n,
      |  ROUND(b.mean_score, 6) AS mean_score,
      |  ROUND(b.pos_rate, 6) AS pos_rate,
      |  ROUND(f.iso, 6) AS iso_rate
      |FROM bins b JOIN fit f ON b.bin = f.bin
      |ORDER BY bin""".stripMargin) { (s, d) =>
      // memoize (10-row checkpointed bins, fitted model): fit +
      // transform would otherwise each re-run the full events binning
      // scan, and the fit is session-lifetime setup like the
      // FP-Growth/PrefixSpan builds
      val (bins, model) = graft.sources.SessionCache
        .getOrElseUpdate(s, ("iso", d)) {
          val b = calibrationBins(s, d)
            .withColumn("w", col("n").cast("double"))
            .localCheckpoint()
          (b, new org.apache.spark.ml.regression.IsotonicRegression()
            .setFeaturesCol("mean_score")
            .setLabelCol("pos_rate")
            .setWeightCol("w")
            .fit(b))
        }
      model.transform(bins)
        .select(
          col("bin"), col("n"),
          round(col("mean_score"), 6).as("mean_score"),
          round(col("pos_rate"), 6).as("pos_rate"),
          round(col("prediction"), 6).as("iso_rate"))
        .orderBy(col("bin"))
    }

  val defs: Seq[QDef] = Seq(qAuc, qPsi, qKsTest, qSurvivalKm,
    qConfusionMetrics, qMrr, qNdcg, qCalibrationBins,
    qCalibrationIsotonic)
}
