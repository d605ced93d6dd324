package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableLoader

/** Round-5 experimentation pack: independent recomputation checks on
  * sf0.001 plus structural invariants. */
class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val activeDays: Map[Long, Seq[java.time.LocalDate]] =
    TableLoader.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).map { case (u, xs) =>
        u -> xs.map(_._2).sortBy(_.toEpochDay)
      }

  test("q_growth_accounting matches a direct per-user replay") {
    val out = SparkEntry.queries("q_growth_accounting")(spark, sfDir)
      .collect()
      .map(r => r.getDate(0).toLocalDate ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val maxD = activeDays.values.flatten.maxBy(_.toEpochDay)
    var newC = Map.empty[java.time.LocalDate, Long]
    var retC = Map.empty[java.time.LocalDate, Long]
    var resC = Map.empty[java.time.LocalDate, Long]
    var chuC = Map.empty[java.time.LocalDate, Long]
    def bump(m: Map[java.time.LocalDate, Long], d: java.time.LocalDate) =
      m.updated(d, m.getOrElse(d, 0L) + 1)
    activeDays.values.foreach { ds =>
      ds.zipWithIndex.foreach { case (d, i) =>
        if (i == 0) newC = bump(newC, d)
        else if (ds(i - 1).plusDays(1) == d) retC = bump(retC, d)
        else resC = bump(resC, d)
        val next = if (i + 1 < ds.size) Some(ds(i + 1)) else None
        if (d.isBefore(maxD) &&
            next.forall(n => n.isAfter(d.plusDays(1))))
          chuC = bump(chuC, d.plusDays(1))
      }
    }
    val allDays = newC.keySet ++ retC.keySet ++ resC.keySet ++ chuC.keySet
    assert(out.keySet == allDays)
    allDays.foreach { d =>
      assert(out(d) == ((newC.getOrElse(d, 0L), retC.getOrElse(d, 0L),
        resC.getOrElse(d, 0L), chuC.getOrElse(d, 0L))), s"day $d")
    }
    // conservation: every day's actives = new + retained + resurrected
    val dau = activeDays.values.flatten.groupBy(identity)
      .map { case (d, xs) => d -> xs.size.toLong }
    dau.foreach { case (d, n) =>
      val (nw, rt, rs, _) = out(d)
      assert(nw + rt + rs == n, s"day $d actives")
    }
  }

  test("q_did_effect: cell means bracket sanity and DiD identity") {
    val r = SparkEntry.queries("q_did_effect")(spark, sfDir).collect()(0)
    val (tp, tpo, cp, cpo, did) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(math.abs((tpo - tp) - (cpo - cp) - did) < 2e-6)
    Seq(tp, tpo, cp, cpo).foreach(v => assert(v > 0 && v < 1000))
  }

  test("q_bootstrap_ci: interval brackets the mean, is tight and ordered") {
    val r = SparkEntry.queries("q_bootstrap_ci")(spark, sfDir).collect()(0)
    val (n, mean, lo, hi) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0)
    assert(lo < hi)
    assert(lo <= mean && mean <= hi,
      s"CI [$lo, $hi] must contain the point estimate $mean")
    // CLT width sanity: the 95% band shouldn't exceed mean/2 even at
    // the 1.5k-order fixture
    assert(hi - lo < mean / 2)
  }

  test("poisson weights from the 24-bit hash have mean ~1") {
    import spark.implicits._
    val th = Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L,
      16767247L, 16775819L)
    val u = (1 to 20000).toDF("i")
      .select(conv(substring(md5(concat(col("i").cast("string"),
        lit("-x")).cast("binary")), 1, 6), 16, 10)
        .cast("bigint").as("u"))
    val w = th.zipWithIndex
      .foldLeft(when(lit(false), 0)) { case (acc, (t, k)) =>
        acc.when(col("u") < t, k)
      }.otherwise(7)
    val mean = u.select(w.as("w")).agg(avg(col("w"))).head().getDouble(0)
    assert(math.abs(mean - 1.0) < 0.03, s"E[w] = $mean")
  }

  test("q_srm_check: chi2 consistent with counts, no SRM on hash split") {
    val r = SparkEntry.queries("q_srm_check")(spark, sfDir).collect()(0)
    val (nt, nc, chi2, srm) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))
    assert(nt + nc > 0)
    val expect = math.pow((nt - nc).toDouble, 2) / (nt + nc)
    assert(math.abs(chi2 - expect) < 1e-6)
    // user_id % 2 is a clean 50/50 assignment on the fixture: the
    // designed split must not flag SRM
    assert(!srm, s"SRM flagged: $nt vs $nc")
    assert(srm == (chi2 > 10.828))
  }

  test("q_cuped_effect: variance reduced, adjustment unbiased-shaped") {
    val r = SparkEntry.queries("q_cuped_effect")(spark, sfDir).collect()(0)
    val (n, raw, cuped, vr) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0)
    // theta is the OLS minimizer: adjusted variance can never exceed
    // the raw outcome variance (up to rounding)
    assert(vr <= 1.0 + 1e-6, s"var_ratio $vr")
    assert(vr > 0)
    // no real treatment exists in the fixture: both estimates are
    // near-zero noise around the user-mean spread
    assert(math.abs(raw) < 50 && math.abs(cuped) < 50)
  }

  test("off-policy estimators agree structurally: DR = DM + correction, " +
    "and IPS/SNIPS/DR all track the same target value") {
    val ips = SparkEntry.queries("q_ips_policy_value")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
      .toMap
    val dr = SparkEntry.queries("q_dr_policy_value")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(ips.keySet == dr.keySet)
    dr.foreach { case (et, (n, dm, corr, drv)) =>
      // identity (up to the three independent 6dp rounds)
      assert(math.abs(drv - (dm + corr)) < 2e-6, s"$et: $drv != $dm+$corr")
      // both estimate E[value under target policy]; with a ~50% match
      // rate and positive bounded rewards they must land in the same
      // ballpark (DR is the variance-reduced one)
      val ipsV = ips(et)._3
      assert(drv > 0 && ipsV > 0)
      assert(math.abs(drv - ipsV) < math.max(drv, ipsV),
        s"$et: DR $drv vs IPS $ipsV implausibly far")
      assert(ips(et)._1 == n)
    }
  }

  test("q_conformal_interval: pooled empirical coverage honors the " +
    "1 - alpha guarantee within finite-sample noise") {
    val rows = SparkEntry.queries("q_conformal_interval")(spark, sfDir)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
          r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, nCal, qHat, nTest, cov) =>
      assert(nCal >= 9, s"$et calibration too small for alpha=0.1")
      assert(qHat > 0 && nTest > 0)
      assert(cov >= 0.0 && cov <= 1.0)
    }
    // marginal (pooled) coverage: E = 0.9; binomial noise at the
    // fixture's ~150 pooled test rows gives sigma ~ 0.025
    val pooledN = rows.map(_._4).sum
    val pooledCovered = rows.map { case (_, _, _, n, c) =>
      math.round(c * n)
    }.sum
    val pooled = pooledCovered.toDouble / pooledN
    assert(pooled >= 0.8 && pooled <= 1.0,
      s"pooled coverage $pooled violates the conformal guarantee band")
  }
}
