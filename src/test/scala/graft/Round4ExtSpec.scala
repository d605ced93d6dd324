package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableLoader

/** Semantic invariants for the round-4 stat/curation/warehouse/
  * train-prep operators, checked against independent driver-side
  * recomputations on sf0.001 (the PipelineExtSpec discipline).
  * GoldenParitySpec already proves cross-ENGINE parity; these tests
  * catch the failure mode parity cannot — the Spark query and its
  * oracle SQL encoding the same wrong semantics.
  */
class Round4ExtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q_merge_upsert: merged balance = base + per-customer spend; " +
    "every customer appears exactly once") {
    val out = run("q_merge_upsert").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val base = TableLoader.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val spend = TableLoader.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == base.keySet ++ spend.keySet)
    out.foreach { case (k, (action, bal)) =>
      val expect = BigDecimal(base.getOrElse(k, 0.0)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) +
        BigDecimal(spend.getOrElse(k, 0.0)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)
      assert(math.abs(bal - expect.toDouble) < 1e-9, s"cust $k")
      val want =
        if (!base.contains(k)) "insert"
        else if (!spend.contains(k)) "keep" else "update"
      assert(action == want, s"cust $k action $action != $want")
    }
  }

  test("q_fk_integrity: zero orphans on the healthy fixture, child " +
    "counts equal table sizes") {
    val rows = run("q_fk_integrity").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(
      "lineitem->orders", "orders->customer", "customer->nation"))
    assert(rows.values.forall(_._2 == 0L), s"orphans: $rows")
    assert(rows("lineitem->orders")._1 ==
      TableLoader.lineitem(spark, sfDir).count())
    assert(rows("orders->customer")._1 ==
      TableLoader.orders(spark, sfDir).count())
  }

  test("q_gini_spend: coefficients in [0,1), total spend matches a " +
    "direct sum") {
    val rows = run("q_gini_spend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getDouble(3)
      assert(g >= 0.0 && g < 1.0,
        s"nation ${r.getAs[Number](0)} gini $g")
    }
    val total = rows.map(r => BigDecimal(r.getDouble(2))).sum
    val direct = BigDecimal(
      TableLoader.orders(spark, sfDir)
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .head().getDouble(0))
    assert((total - direct).abs < BigDecimal(1e-6),
      s"$total vs $direct")
  }

  test("q_benford_digits: shares sum to 1 and counts cover all orders") {
    val rows = run("q_benford_digits").collect()
    val n = rows.map(_.getLong(1)).sum
    assert(n == TableLoader.orders(spark, sfDir).count())
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum $shareSum")
  }

  test("q_chi2_contingency: observed cells sum to the corpus size; " +
    "expected cells reproduce marginal products") {
    val rows = run("q_chi2_contingency").collect()
      .map(r => (r.getString(1), r.getString(0), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val nDocs = TableLoader.documents(spark, sfDir).count()
    assert(rows.map(_._3).sum == nDocs)
    // expected = rowTot*colTot/N per OBSERVED cell (zero-observed
    // combos are absent from the output, so the expected column does
    // NOT sum to N — check cells individually against marginals)
    val docs = TableLoader.documents(spark, sfDir)
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.size).toMap
    val byLang = docs.groupBy(_._2).view.mapValues(_.size).toMap
    rows.foreach { case (src, lang, _, expected, term) =>
      val want = byLang(lang).toDouble * bySrc(src) / nDocs
      assert(math.abs(expected - want) < 1e-5, s"($lang,$src) expected")
      assert(term >= 0.0, "chi2 term must be nonnegative")
    }
  }

  test("q_train_mix: mix weights are a probability vector that " +
    "flattens the raw shares (temperature < 1)") {
    val rows = run("q_train_mix").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    val wSum = rows.map(_._3).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum $wSum")
    // temperature 0.7 compresses: the largest share loses mass, the
    // smallest gains
    val maxByShare = rows.maxBy(_._2)
    val minByShare = rows.minBy(_._2)
    assert(maxByShare._3 < maxByShare._2, s"head not flattened: $maxByShare")
    assert(minByShare._3 > minByShare._2, s"tail not boosted: $minByShare")
  }

  test("q_ewma_user: smoothed value sits within the user's value range " +
    "and n_events covers all events") {
    val out = run("q_ewma_user").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byUser = TableLoader.events(spark, sfDir)
      .select(col("user_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq.groupBy(_._1)
    assert(out.map(_._3).sum == byUser.values.map(_.size).sum)
    out.foreach { case (u, ewma, _) =>
      val vs = byUser(u).map(_._2)
      assert(ewma >= vs.min - 5e-5 && ewma <= vs.max + 5e-5,
        s"user $u ewma $ewma outside [${vs.min}, ${vs.max}]")
    }
  }

  test("q_regr_ols: slope/intercept match the closed-form least " +
    "squares on collected data") {
    val out = run("q_regr_ols").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val data = TableLoader.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    data.foreach { case (flag, rows) =>
      val n = rows.size.toDouble
      val mx = rows.map(_._2).sum / n
      val my = rows.map(_._3).sum / n
      val sxx = rows.map(r => (r._2 - mx) * (r._2 - mx)).sum
      val sxy = rows.map(r => (r._2 - mx) * (r._3 - my)).sum
      val slope = sxy / sxx
      val (gotSlope, gotIntercept, gotR2) = out(flag)
      assert(math.abs(gotSlope - slope) < 5e-3, s"$flag slope")
      assert(math.abs(gotIntercept - (my - slope * mx)) < 5e-2,
        s"$flag intercept")
      assert(gotR2 >= 0.0 && gotR2 <= 1.0, s"$flag r2 $gotR2")
    }
  }

  test("q_pack_sequences: per-source offsets are contiguous (each " +
    "start equals the previous start + length) and chunks advance " +
    "monotonically") {
    val rows = run("q_pack_sequences").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._1)
      ordered.zip(ordered.drop(1)).foreach { case (a, b) =>
        assert(b._4 == a._4 + a._3,
          s"doc ${b._1}: start ${b._4} != ${a._4} + ${a._3}")
      }
      ordered.foreach { case (id, _, nTok, start, cf, cl, straddles) =>
        assert(cf == start / 512 && cl == (start + nTok - 1) / 512,
          s"doc $id chunk ids")
        assert(straddles == (cf != cl), s"doc $id straddle flag")
      }
    }
  }

  test("q_curation_funnel: survivor counts are monotone non-increasing " +
    "and totals cover the corpus") {
    val rows = run("q_curation_funnel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._2).sum ==
      TableLoader.documents(spark, sfDir).count())
    rows.foreach { case (src, t, l1, l2, l3, l4) =>
      assert(t >= l1 && l1 >= l2 && l2 >= l3 && l3 >= l4,
        s"$src funnel not monotone: $t $l1 $l2 $l3 $l4")
    }
  }

  test("q_rfm_segments: quartile sizes differ by at most one and " +
    "every customer with orders is segmented") {
    val rows = run("q_rfm_segments").collect()
      .map(r => (r.getInt(4), r.getInt(5), r.getInt(6)))
    val nCust = TableLoader.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().count()
    assert(rows.length == nCust)
    for (quartiles <- Seq(rows.map(_._1), rows.map(_._2), rows.map(_._3))) {
      val sizes = quartiles.groupBy(identity).values.map(_.size)
      assert(quartiles.toSet == Set(1, 2, 3, 4))
      assert(sizes.max - sizes.min <= 1, s"unbalanced ntile: $sizes")
    }
  }
}
