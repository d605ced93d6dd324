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

  val defs: Seq[QDef] = Seq(qCohenKappa, qLoglossBrier, qPrCurve)
}
