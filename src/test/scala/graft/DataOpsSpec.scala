package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableLoader

/** Round-5 data-ops pack: independent recomputation cross-checks on
  * sf0.001 (different algorithm/path, equal answers) plus invariant
  * tests for the queries whose oracle only pins the SQL shape. */
class DataOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("q_fk_orphans: clean star schema audits to zero everywhere") {
    val rows = SparkEntry.queries("q_fk_orphans")(spark, sfDir).collect()
    assert(rows.length == 7)
    // the fixture generator emits referentially-intact data; a nonzero
    // count here means the anti-join keys are wired wrong
    rows.foreach(r => assert(r.getLong(1) == 0L, r.getString(0)))
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0))
      .toSeq.sorted)
  }

  test("q_fk_orphans counts seeded orphans (left_anti null semantics)") {
    import spark.implicits._
    val child = Seq(
      (1L, Some(10L)), (2L, Some(99L)), (3L, None), (4L, Some(11L)))
      .toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    // same shape as the query's per-edge builder: anti join, count
    val n = child.join(parent, child("fk") === parent("pk"), "left_anti")
      .count()
    // 99 (missing parent) and NULL both orphan, matching NOT EXISTS
    assert(n == 2L)
  }

  test("q_dq_rules: all-clean fixture, rule rows complete and sorted") {
    val rows = SparkEntry.queries("q_dq_rules")(spark, sfDir).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getString(0)).toSeq == Seq(
      "bad_returnflag", "discount_out_of_range", "future_shipdate",
      "negative_tax", "nonpositive_price", "nonpositive_qty",
      "null_orderkey"))
    rows.foreach(r => assert(r.getLong(1) == 0L, r.getString(0)))
  }

  test("q_psi_drift matches a direct PSI recomputation") {
    val ev = TableLoader.events(spark, sfDir)
      .select(col("event_type"), col("value"), dayofmonth(col("ts")))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    val out = SparkEntry.queries("q_psi_drift")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val buckets = rows.groupBy(r => math.min(math.floor(r._2 / 50), 9))
      val ta = rows.count(_._3 <= 15).toDouble
      val tb = rows.count(_._3 > 15).toDouble
      val psi = buckets.values.map { bs =>
        val p = (bs.count(_._3 <= 15) + 0.5) / (ta + 5.0)
        val q = (bs.count(_._3 > 15) + 0.5) / (tb + 5.0)
        (p - q) * math.log(p / q)
      }.sum
      assert(math.abs(out(t) - psi) < 5e-6, s"$t: ${out(t)} vs $psi")
    }
  }

  test("q_linreg_group matches a direct OLS fit") {
    val li = TableLoader.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val out = SparkEntry.queries("q_linreg_group")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    li.groupBy(_._1).foreach { case (f, rows) =>
      val n = rows.size.toDouble
      val mx = rows.map(_._2).sum / n
      val my = rows.map(_._3).sum / n
      val sxy = rows.map(r => (r._2 - mx) * (r._3 - my)).sum
      val sxx = rows.map(r => (r._2 - mx) * (r._2 - mx)).sum
      val slope = sxy / sxx
      val icept = my - slope * mx
      val (oSlope, oIcept) = out(f)
      assert(math.abs(oSlope - slope) < 1e-3, s"$f slope")
      assert(math.abs(oIcept - icept) < 1e-3, s"$f intercept")
    }
  }

  test("q_mad_outlier: outliers bounded and MAD below spread") {
    val rows = SparkEntry.queries("q_mad_outlier")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (med, mad, nOut, n) =
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))
      assert(mad >= 0 && med >= 0)
      // modified-z outliers are a tail: must be a small minority
      assert(nOut < n / 4, s"${r.getString(0)}: $nOut of $n")
    }
  }

  test("q_shard_pack: partition-parallel prefix sum equals global cumsum") {
    val rows = SparkEntry.queries("q_shard_pack")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // direct single-threaded packing from the raw table
    val docs = TableLoader.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var off = 0L
    val direct = docs.map { case (id, t) =>
      val shard = off / 5000L
      off += t
      (shard, id, t)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, ds) =>
      (s, ds.length.toLong, ds.map(_._3).sum,
        ds.map(_._2).min, ds.map(_._2).max)
    }
    assert(rows.toSeq == direct)
    // shards partition the doc_id order: contiguous, non-overlapping
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4)
      case _           =>
    }
  }

  test("q_embed_quantize: scale positive, saturation hit, L1 bounded") {
    val rows = SparkEntry.queries("q_embed_quantize")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, qSum, qL1, nSat) =
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(scale > 0)
      // the max-|x| element quantizes to exactly ±127
      assert(nSat >= 1)
      assert(math.abs(qSum) <= qL1)
      assert(qL1 <= 127L * 64L)
    }
  }

  test("q_corr_matrix: 6 pairs, each within [-1, 1]") {
    val rows = SparkEntry.queries("q_corr_matrix")(spark, sfDir).collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(math.abs(r.getDouble(1)) <= 1.0))
  }

  test("q_dp_count_noise: Laplace(1) noise actually applied, release " +
    "clamped nonnegative, draw deterministic per group key") {
    val run1 = SparkEntry.queries("q_dp_count_noise")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getDouble(3)))
    // true counts recomputed independently
    val truth = TableLoader.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    assert(run1.length == truth.size)
    val absNoise = run1.map { case (et, day, noisy, released) =>
      val cnt = truth((et, day))
      assert(released >= 0.0, s"negative release: $et $day")
      assert(released == math.max(noisy, 0.0) ||
        math.abs(released - math.max(noisy, 0.0)) < 1e-9)
      math.abs(noisy - cnt)
    }.sorted
    // every group must actually be perturbed (a zero draw means the
    // inverse CDF is wired wrong) and the median |noise| must look
    // like Laplace(b=1): median = ln 2 ≈ 0.693
    assert(absNoise.head > 0.0, "a group released its true count")
    val median = absNoise(absNoise.length / 2)
    assert(median > 0.15 && median < 3.0,
      s"median |noise| $median not Laplace(1)-like")
    // seeded determinism: a second run draws the identical noise
    val run2 = SparkEntry.queries("q_dp_count_noise")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getDouble(3)))
    assert(run1.toSeq == run2.toSeq)
  }
}
