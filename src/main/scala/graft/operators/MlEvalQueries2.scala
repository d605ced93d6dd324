package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Model-evaluation pack 3: inter-rater agreement (Cohen's kappa),
  * proper scoring rules (log-loss + Brier) and the precision–recall
  * curve — the remaining standard readouts of a classifier-evaluation
  * layer, over the same deterministic value-threshold pseudo-scorer
  * the confusion/calibration queries use.
  *
  * Scale discipline (shared with MlEvalQueries): reduce the fact rows
  * to a BOUNDED grouped distribution (class pairs, score bins) in one
  * partial+final aggregate, then run the metric formula over that
  * small result. Per-bin probabilities are exact dyadic-free ratios of
  * small integers; the only transcendental (LN in log-loss) runs over
  * ≤ 10 bin constants, so cross-engine 1-ulp wobble is bounded by the
  * bin count, not the row count → ROUND(6) closes the seam.
  */
object MlEvalQueries2 {

  private val predCase =
    """CASE WHEN value >= 80 THEN 'purchase'
      |      WHEN value >= 60 THEN 'click'
      |      WHEN value >= 40 THEN 'view'
      |      WHEN value >= 20 THEN 'signup'
      |      ELSE 'error' END""".stripMargin

  /** Cohen's kappa between the value-threshold scorer and the actual
    * event type: chance-corrected agreement, the metric that exposes a
    * classifier coasting on class imbalance (raw accuracy rewards
    * predicting the majority; kappa subtracts the marginal-product
    * expectation). One 5×5 confusion aggregate; marginal products are
    * integer-exact in double (≤ 1e10), so po/pe/kappa are identical
    * IEEE on both engines. */
  val qCohenKappa: QDef = QDef(
    "q_cohen_kappa",
    s"""WITH cm AS (
       |  SELECT event_type AS a, $predCase AS p, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |mr AS (SELECT a, SUM(n) AS ra FROM cm GROUP BY 1),
       |mc AS (SELECT p, SUM(n) AS cp FROM cm GROUP BY 1),
       |g AS (
       |  SELECT
       |    (SELECT SUM(n) FROM cm) AS n,
       |    (SELECT SUM(n) FROM cm WHERE a = p) AS agree,
       |    (SELECT SUM(ra * cp) FROM mr JOIN mc ON mr.a = mc.p) AS exp2
       |  FROM (SELECT 1))
       |SELECT CAST(n AS BIGINT) AS n,
       |  ROUND(CAST(agree AS DOUBLE) / n, 6) AS po,
       |  ROUND(CAST(exp2 AS DOUBLE) / (n * n), 6) AS pe,
       |  ROUND((CAST(agree AS DOUBLE) / n
       |      - CAST(exp2 AS DOUBLE) / (n * n))
       |    / (1 - CAST(exp2 AS DOUBLE) / (n * n)), 6) AS kappa
       |FROM g""".stripMargin) { (s, d) =>
    val cm = events(s, d)
      .groupBy(col("event_type").as("a"), expr(predCase).as("p"))
      .agg(count(lit(1)).as("n"))
    val mr = cm.groupBy(col("a")).agg(sum(col("n")).as("ra"))
    val mc = cm.groupBy(col("p")).agg(sum(col("n")).as("cp"))
    val tot = cm.agg(
      sum(col("n")).as("n"),
      sum(when(col("a") === col("p"), col("n")).otherwise(0L))
        .as("agree"))
    // the marginal-product expectation joins two ≤5-row aggregates —
    // a broadcast pair, then a single-row cross join back
    val exp2 = mr.join(mc, col("a") === col("p"))
      .agg(sum(col("ra") * col("cp")).as("exp2"))
    val po = col("agree").cast("double") / col("n")
    val pe = col("exp2").cast("double") / (col("n") * col("n"))
    tot.crossJoin(broadcast(exp2))
      .select(
        col("n"),
        round(po, 6).as("po"),
        round(pe, 6).as("pe"),
        round((po - pe) / (lit(1) - pe), 6).as("kappa"))
  }

  /** Log-loss and Brier score of a binned probability forecast for
    * "is this event a purchase": score bins of width 50 map to
    * p = (bin + 0.5)/10 ∈ {0.05 … 0.95}, so both scoring rules reduce
    * to exact per-bin counts times ≤ 10 constant terms. Brier is pure
    * rational arithmetic (exact); log-loss touches LN on 20 constants
    * → ROUND(6). The canonical "is the scorer sharp AND calibrated"
    * readout, one aggregate pass at any corpus size. */
  val qLoglossBrier: QDef = QDef(
    "q_logloss_brier",
    """WITH b AS (
      |  SELECT LEAST(CAST(FLOOR(value / 50) AS INT), 9) AS bin,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |g AS (
      |  SELECT bin, (bin + 0.5) / 10 AS p,
      |    SUM(y) AS pos, COUNT(*) - SUM(y) AS neg
      |  FROM b GROUP BY 1),
      |t AS (
      |  SELECT SUM(pos + neg) AS n,
      |    SUM(-(pos * LN(p) + neg * LN(1 - p))) AS ll,
      |    SUM(pos * (1 - p) * (1 - p) + neg * p * p) AS br
      |  FROM g)
      |SELECT CAST(n AS BIGINT) AS n,
      |  ROUND(ll / n, 6) AS logloss,
      |  ROUND(br / n, 6) AS brier
      |FROM t""".stripMargin) { (s, d) =>
    val g = events(s, d)
      .select(
        least(floor(col("value") / 50).cast("int"), lit(9)).as("bin"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("y"))
      .groupBy(col("bin"))
      .agg(sum(col("y")).as("pos"),
        (count(lit(1)) - sum(col("y"))).as("neg"))
      .withColumn("p", (col("bin") + 0.5) / 10)
    g.agg(
        sum(col("pos") + col("neg")).as("n"),
        sum(-(col("pos") * log(col("p"))
          + col("neg") * log(lit(1) - col("p")))).as("ll"),
        sum(col("pos") * (lit(1) - col("p")) * (lit(1) - col("p"))
          + col("neg") * col("p") * col("p")).as("br"))
      .select(
        col("n"),
        round(col("ll") / col("n"), 6).as("logloss"),
        round(col("br") / col("n"), 6).as("brier"))
  }

  /** Precision–recall curve at the 10 bin thresholds: predict
    * "purchase" when value ≥ 50·bin, sweep bin from 9 down to 0. The
    * curve derives from SUFFIX sums over the 10-bin aggregate (one
    * descending window over 10 rows — no re-scan per threshold), and
    * every point is an exact integer ratio → ROUND(6) is rendering
    * only. F1 per threshold completes the operating-point picker. */
  val qPrCurve: QDef = QDef(
    "q_pr_curve",
    """WITH b AS (
      |  SELECT LEAST(CAST(FLOOR(value / 50) AS INT), 9) AS bin,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |g AS (
      |  SELECT bin, SUM(y) AS pos, COUNT(*) - SUM(y) AS neg
      |  FROM b GROUP BY 1),
      |c AS (
      |  SELECT bin,
      |    SUM(pos) OVER (ORDER BY bin DESC) AS tp,
      |    SUM(neg) OVER (ORDER BY bin DESC) AS fp,
      |    SUM(pos) OVER () AS p_all
      |  FROM g)
      |SELECT CAST(bin * 50 AS INT) AS threshold,
      |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |  ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS prec,
      |  ROUND(CAST(tp AS DOUBLE) / p_all, 6) AS rec,
      |  ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + (p_all - tp)), 6)
      |    AS f1
      |FROM c
      |ORDER BY threshold""".stripMargin) { (s, d) =>
    val g = events(s, d)
      .select(
        least(floor(col("value") / 50).cast("int"), lit(9)).as("bin"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("y"))
      .groupBy(col("bin"))
      .agg(sum(col("y")).as("pos"),
        (count(lit(1)) - sum(col("y"))).as("neg"))
    val wDesc = Window.orderBy(col("bin").desc)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    g.select(col("bin"),
        sum(col("pos")).over(wDesc).as("tp"),
        sum(col("neg")).over(wDesc).as("fp"),
        sum(col("pos")).over(wAll).as("p_all"))
      .select(
        (col("bin") * 50).cast("int").as("threshold"),
        col("tp"), col("fp"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .as("prec"),
        round(col("tp").cast("double") / col("p_all"), 6).as("rec"),
        round((col("tp") * 2).cast("double")
          / (col("tp") * 2 + col("fp") + (col("p_all") - col("tp"))), 6)
          .as("f1"))
      .orderBy(col("threshold"))
  }

  /** Split-conformal prediction intervals — the distribution-free
    * uncertainty wrapper modern ML eval puts around ANY point
    * predictor: fit on train, take the ⌈(n+1)(1−α)⌉-th smallest
    * absolute residual on a CALIBRATION split as the interval radius
    * q̂, and the marginal coverage guarantee P(|y−ŷ| ≤ q̂) ≥ 1−α holds
    * on exchangeable test data with NO model or distribution
    * assumptions (Vovk; Lei et al.). Here the predictor is the
    * per-event-type train mean, splits are the md5 content hash of
    * event_id (70/15/15 — stable under repartitioning, the
    * q_split_hash discipline), α = 0.1.
    *
    * Determinism: the train mean comes from DECIMAL-exact sums;
    * residuals are identical doubles both engines; the order statistic
    * ranks (residual, event_id) in a window PARTITIONED by event_type;
    * the rank index ⌈0.9(n+1)⌉ is computed integer-side as
    * (9(n+1)+9) div 10 so no float boundary can flip it. Coverage at
    * the fixture's tiny per-type calibration sizes is noisy — the
    * GUARANTEE is what the spec checks at the pooled level; the hash
    * gate pins the exact per-type values. */
  val qConformalInterval: QDef = QDef(
    "q_conformal_interval",
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(value AS DECIMAL(18,6)) AS v,
      |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))
      |      AS INT) % 100 AS b
      |  FROM events),
      |tr AS (
      |  SELECT event_type, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mu
      |  FROM e WHERE b < 70 GROUP BY event_type),
      |cal AS (
      |  SELECT e.event_type, e.event_id,
      |    ABS(CAST(v AS DOUBLE) - mu) AS r
      |  FROM e JOIN tr USING (event_type) WHERE b >= 70 AND b < 85),
      |rk AS (
      |  SELECT event_type, r,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY r, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS nc
      |  FROM cal),
      |qh AS (
      |  SELECT event_type, CAST(MAX(nc) AS BIGINT) AS n_cal,
      |    MIN(CASE WHEN rn = (9 * (nc + 1) + 9) // 10 THEN r END)
      |      AS q_hat
      |  FROM rk GROUP BY event_type),
      |te AS (
      |  SELECT e.event_type, CAST(v AS DOUBLE) AS vv, mu
      |  FROM e JOIN tr USING (event_type) WHERE b >= 85)
      |SELECT t.event_type, q.n_cal, ROUND(q.q_hat, 6) AS q_hat,
      |  CAST(COUNT(*) AS BIGINT) AS n_test,
      |  ROUND(SUM(CASE WHEN q.q_hat IS NULL THEN 1
      |    WHEN ABS(vv - mu) <= q.q_hat THEN 1 ELSE 0 END)
      |    * 1.0 / COUNT(*), 4) AS coverage
      |FROM te t JOIN qh q USING (event_type)
      |GROUP BY t.event_type, q.n_cal, q.q_hat
      |ORDER BY t.event_type""".stripMargin) { (s, d) =>
    val bucket = graft.functions.Md5HexSlice(
      col("event_id").cast("string").cast("binary"), 1, 4)
      .cast("int") % 100
    val e = events(s, d)
      .select(col("event_type"), col("event_id"),
        col("value").cast("decimal(18,6)").as("v"), bucket.as("b"))
    val tr = e.filter(col("b") < 70)
      .groupBy(col("event_type"))
      .agg((sum(col("v")).cast("double") / count(lit(1))).as("mu"))
    val cal = e.filter(col("b") >= 70 && col("b") < 85)
      .join(tr, "event_type")
      .select(col("event_type"), col("event_id"),
        abs(col("v").cast("double") - col("mu")).as("r"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("r"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    val rk = cal.select(col("event_type"), col("r"),
      row_number().over(w).as("rn"),
      count(lit(1)).over(wAll).as("nc"))
    val qh = rk.groupBy(col("event_type"))
      .agg(max(col("nc")).as("n_cal"),
        // ⌈0.9(n+1)⌉ integer-side: Spark's Column./ is DOUBLE division,
        // so the rank index uses SQL `div` to mirror DuckDB's `//`
        min(when(col("rn") === expr("(9 * (nc + 1) + 9) div 10"),
          col("r"))).as("q_hat"))
    val te = e.filter(col("b") >= 85)
      .join(tr, "event_type")
      .select(col("event_type"), col("v").cast("double").as("vv"),
        col("mu"))
    // calibration smaller than the rank index (n_cal < ⌈0.9(n+1)⌉−1,
    // i.e. < 9 at α=0.1) means the conformal radius is INFINITE —
    // q_hat stays NULL and every test row is covered (coverage 1), as
    // the finite-sample guarantee requires; a NULL-propagating compare
    // would silently report coverage 0 instead
    te.join(qh, "event_type")
      .groupBy(col("event_type"), col("n_cal"), col("q_hat"))
      .agg(
        count(lit(1)).as("n_test"),
        round(
          sum(when(col("q_hat").isNull, 1L)
            .when(abs(col("vv") - col("mu")) <= col("q_hat"), 1L)
            .otherwise(0L)) * lit(1.0) / count(lit(1)),
          4).as("coverage"))
      .select(col("event_type"), col("n_cal"),
        round(col("q_hat"), 6).as("q_hat"), col("n_test"),
        col("coverage"))
      .orderBy(col("event_type"))
  }

  val defs: Seq[QDef] =
    Seq(qCohenKappa, qLoglossBrier, qPrCurve, qConformalInterval)
}
