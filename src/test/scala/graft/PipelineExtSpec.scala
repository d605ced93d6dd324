package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableLoader

/** Round-4 pipeline extensions, cross-checked against independent
  * driver-side recomputations on sf0.001 (the SketchSpec discipline:
  * same data, different algorithm/engine path, equal answers). */
class PipelineExtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  /** Epoch µs of a Timestamp (getTime is ms-truncated; the fixture is
    * µs-grained, matching the engine's unix_micros). */
  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private lazy val ev: Seq[(Long, Long, String, java.sql.Timestamp, Double)] =
    TableLoader.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), r.getDouble(4))).toSeq

  test("q_entropy matches a direct per-user Shannon computation") {
    val out = SparkEntry.queries("q_entropy")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val byUser = ev.groupBy(_._2)
    assert(out.keySet == byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val n = rows.size.toDouble
      val h = math.log(n) -
        rows.groupBy(_._3).values.map(_.size.toDouble)
          .map(c => c * math.log(c)).sum / n
      assert(math.abs(out(u) - h) < 5e-4, s"user $u: ${out(u)} vs $h")
      // uniform over k types bounds H by ln k; 5 types in the fixture
      assert(out(u) >= 0 && out(u) <= math.log(5.0) + 5e-4)
    }
  }

  test("q_transition_matrix matches direct per-user LEAD counts") {
    val out = SparkEntry.queries("q_transition_matrix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val direct = ev.groupBy(_._2).values.flatMap { rows =>
      rows.sortBy(r => (micros(r._4), r._1)).map(_._3)
        .sliding(2).collect { case Seq(a, b) => (a, b) }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out == direct)
    // every event except each user's last contributes one transition
    assert(out.values.sum == ev.size - ev.map(_._2).distinct.size)
  }

  test("q_user_holdout is entity-consistent (whole users in or out)") {
    val held = SparkEntry.queries("q_user_holdout")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val heldUsers = held.map(_._2).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(u: Long): Int = {
      val hex = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      Integer.parseInt(hex, 16) % 10
    }
    val expectUsers = ev.map(_._2).distinct.filter(bucket(_) == 0).toSet
    assert(heldUsers == expectUsers, "held-out user set != md5 rule")
    // consistency: EVERY event of a held-out user is present
    val expectEvents = ev.filter(e => expectUsers(e._2)).map(_._1).toSet
    assert(held.map(_._1).toSet == expectEvents,
      "row-level leakage: held-out users must bring all their events")
  }

  test("q_anomaly_zscore flags exactly the 3-sigma tail") {
    val out = SparkEntry.queries("q_anomaly_zscore")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val byType = ev.groupBy(_._3)
    val expected = byType.values.flatMap { rows =>
      val n = rows.size
      val mu = rows.map(_._5).sum / n
      val sigma = math.sqrt(
        rows.map(r => (r._5 - mu) * (r._5 - mu)).sum / (n - 1))
      rows.map(r => r._1 -> (r._5 - mu) / sigma)
        .filter { case (_, z) => math.abs(z) > 3 }
    }.toMap
    assert(out.keySet == expected.keySet)
    out.foreach { case (id, z) =>
      assert(math.abs(z - expected(id)) < 5e-4, s"event $id: $z")
    }
  }

  test("q_weighted_avg equals the BigDecimal-exact quotient") {
    val out = SparkEntry.queries("q_weighted_avg")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val li = TableLoader.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    li.groupBy(_._1).foreach { case (flag, rows) =>
      def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val num = rows.map(r => d2(r._2) * d2(r._3)).sum
      val den = rows.map(r => d2(r._3)).sum
      val w = (num.toDouble / den.toDouble)
      assert(math.abs(out(flag) - w) < 5e-4, s"$flag: ${out(flag)} vs $w")
    }
  }

  test("q_bm25_top_term picks the per-doc argmax of a direct BM25") {
    val docs = TableLoader.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.size).sum / n
    val df = docs.flatMap(_._2.distinct).groupBy(identity)
      .map { case (w, v) => w -> v.length.toDouble }
    def score(tf: Int, w: String, dl: Int): Double =
      math.log((n - df(w) + 0.5) / (df(w) + 0.5) + 1) *
        (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val expected = docs.map { case (id, toks) =>
      val best = toks.groupBy(identity)
        .map { case (w, v) => (w, score(v.size, w, toks.size)) }
        .toSeq.minBy { case (w, sc) => (-sc, w) }
      id -> best
    }.toMap
    val out = SparkEntry.queries("q_bm25_top_term")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(out.keySet == expected.keySet)
    out.foreach { case (id, (term, sc)) =>
      assert(term == expected(id)._1, s"doc $id: $term vs ${expected(id)._1}")
      assert(math.abs(sc - expected(id)._2) < 5e-4, s"doc $id score")
    }
  }

  test("q_centroid_dist matches a direct centroid cosine") {
    val vecs = TableLoader.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.get(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val cent = vecs.groupBy(_._2).map { case (l, vs) =>
      val c = new Array[Double](64)
      vs.foreach(v => (0 until 64).foreach(i => c(i) += v._3(i)))
      l -> c.map(_ / vs.length)
    }
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val out = SparkEntry.queries("q_centroid_dist")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, l, v) =>
      val c = cent(l)
      val cos = dot(v, c) / (math.sqrt(dot(v, v)) * math.sqrt(dot(c, c)))
      assert(math.abs(out(id) - cos) < 5e-4, s"vec $id: ${out(id)} vs $cos")
      assert(out(id) >= -1.0001 && out(id) <= 1.0001)
    }
  }

  test("q_cohort_retention: diagonal equals cohort size, no activity " +
    "before the cohort week") {
    val out = SparkEntry.queries("q_cohort_retention")(spark, sfDir)
      .collect()
      .map(r => (r.getDate(0), r.getDate(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (cw, aw, _) =>
      assert(!aw.before(cw), s"activity $aw before cohort $cw")
    }
    // diagonal cell (c, c): every cohort user is active in their first
    // week by construction, so it is the cohort's max retention cell
    val diag = out.filter { case (cw, aw, _) => cw == aw }
    val cohortSizes = out.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    diag.foreach { case (cw, _, n) =>
      assert(n == cohortSizes(cw),
        s"diagonal of $cw must be the cohort's max retention cell")
    }
  }

  test("q_active_users: WAU dominates DAU and matches a direct count") {
    val out = SparkEntry.queries("q_active_users")(spark, sfDir)
      .collect().map(r => (r.getDate(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // UTC calendar date of each event (matches the session timezone
    // Spark truncates in; java.sql.Date#toLocalDate round-trips the
    // engine's date value through the default zone losslessly)
    val pairs = ev.map(e => (
      e._4.toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDate,
      e._2)).distinct
    out.foreach { case (day, dau, wau) =>
      val d = day.toLocalDate
      val expectDau = pairs.count(_._1 == d)
      val expectWau = pairs.filter { case (pd, _) =>
        !pd.isAfter(d) && !pd.isBefore(d.minusDays(6))
      }.map(_._2).distinct.size
      assert(dau == expectDau, s"$day dau $dau vs $expectDau")
      assert(wau == expectWau, s"$day wau $wau vs $expectWau")
      assert(wau >= dau)
    }
  }

  test("q_quantile_bucket: buckets are monotone in value and balanced") {
    val out = SparkEntry.queries("q_quantile_bucket")(spark, sfDir)
      .collect().map(r => (r.getDouble(1), r.getInt(2)))
    val sorted = out.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
      "bucket must be nondecreasing in value")
    val hist = out.groupBy(_._2).view.mapValues(_.size)
    assert(hist.keySet == (1 to 10).toSet)
    val n = out.size.toDouble
    hist.foreach { case (b, c) =>
      assert(math.abs(c - n / 10) <= n / 100 + 2,
        s"decile $b has $c of ${out.size} rows — not equi-depth")
    }
  }

  test("q_robust_stats matches direct median/MAD/IQR/fence counts") {
    def quantile(xs: Seq[Double], q: Double): Double = {
      val s = xs.sorted
      val idx = q * (s.size - 1)
      val lo = idx.toInt
      if (lo + 1 >= s.size) s(lo)
      else s(lo) + (idx - lo) * (s(lo + 1) - s(lo))
    }
    val out = SparkEntry.queries("q_robust_stats")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    ev.groupBy(_._3).foreach { case (t, rows) =>
      val vs = rows.map(_._5)
      val med = quantile(vs, 0.5)
      val p25 = quantile(vs, 0.25)
      val p75 = quantile(vs, 0.75)
      val mad = quantile(vs.map(v => math.abs(v - med)), 0.5)
      val nOut = vs.count(v =>
        v < p25 - 1.5 * (p75 - p25) || v > p75 + 1.5 * (p75 - p25))
      val (oMed, oMad, oIqr, oN) = out(t)
      assert(math.abs(oMed - med) < 5e-4, s"$t med")
      assert(math.abs(oMad - mad) < 5e-4, s"$t mad")
      assert(math.abs(oIqr - (p75 - p25)) < 5e-4, s"$t iqr")
      assert(oN == nOut, s"$t outliers: $oN vs $nOut")
    }
  }

  test("q_sample_balanced: exactly min(100, class size) per class, " +
    "hash-deterministic") {
    val out = SparkEntry.queries("q_sample_balanced")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hk(id: Long): Long = java.lang.Long.parseLong(
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8), 16)
    // .toSeq first: Map.flatMap over pair-producing functions would
    // rebuild a Map and collapse to one entry per class
    val expected = ev.groupBy(_._3).toSeq.flatMap { case (t, rows) =>
      rows.map(_._1).distinct.sortBy(id => (hk(id), id)).take(100)
        .map(t -> _)
    }.toSet
    assert(out.toSet == expected, "picked set != md5-rank rule")
    out.groupBy(_._1).foreach { case (t, picked) =>
      val classSize = ev.count(_._3 == t)
      assert(picked.size == math.min(100, classSize), s"$t size")
    }
  }

  test("q_time_gapfill: contiguous daily spine, zeros on silent days, " +
    "totals preserved") {
    val out = SparkEntry.queries("q_time_gapfill")(spark, sfDir)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1),
        r.getDouble(2)))
    assert(out.nonEmpty)
    // spine is gap-free: every consecutive day present exactly once
    out.zip(out.tail).foreach { case ((a, _, _), (b, _, _)) =>
      assert(b == a.plusDays(1), s"spine gap between $a and $b")
    }
    // row-count total equals the purchase-event count
    assert(out.map(_._2).sum == ev.count(_._3 == "purchase"))
    // a zero-count day must carry a 0.0 sum
    out.filter(_._2 == 0L).foreach { case (d, _, sv) =>
      assert(sv == 0.0, s"silent day $d has sum $sv")
    }
  }

  test("q_vector_quantize: int8 codes reconstruct within step/2 + " +
    "rounding slack") {
    val out = SparkEntry.queries("q_vector_quantize")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (id, _, step, maxErr) =>
      // nearest-code reconstruction error is bounded by step/2; the
      // emitted lo/step are display-rounded, so allow their slack
      assert(maxErr <= step / 2 + 1e-4, s"vec $id err $maxErr step $step")
      assert(maxErr >= 0)
    }
  }

  test("q_concurrency matches a direct delta-decomposition replay") {
    val out = SparkEntry.queries("q_concurrency")(spark, sfDir)
      .collect()
      .map { r =>
        // ntz columns collect as LocalDateTime; UTC-anchor to epoch µs
        val ldt = r.getAs[java.time.LocalDateTime](0)
        val us = ldt.toInstant(java.time.ZoneOffset.UTC)
        (us.getEpochSecond * 1000000L + us.getNano / 1000L,
          r.getLong(1), r.getLong(2))
      }
    assert(out.nonEmpty)
    // every session opens and closes: deltas cancel, running sum ends 0
    assert(out.map(_._2).sum == 0L)
    assert(out.last._3 == 0L)
    out.foreach { case (_, _, n) => assert(n >= 0) }
    // direct replay: sessionize (30-min gap), hour-boundary deltas
    val hourUs = 3600000000L
    val deltas = scala.collection.mutable.Map[Long, Long]()
    ev.groupBy(_._2).values.foreach { rows =>
      val ts = rows.map(r => micros(r._4)).sorted
      var start = ts.head
      var prev = ts.head
      def close(st: Long, en: Long): Unit = {
        val h0 = if (st % hourUs == 0) st else (st / hourUs + 1) * hourUs
        val h1 = (en / hourUs + 1) * hourUs
        deltas(h0) = deltas.getOrElse(h0, 0L) + 1
        deltas(h1) = deltas.getOrElse(h1, 0L) - 1
      }
      ts.tail.foreach { t =>
        if (t - prev > 1800000000L) { close(start, prev); start = t }
        prev = t
      }
      close(start, prev)
    }
    val expected = deltas.filter(_._2 != 0L)
    val got = out.map(t => t._1 -> t._2).toMap
      .filter(_._2 != 0L)
    assert(got == expected.toMap, "delta map mismatch")
    // running sum consistency inside the output itself
    var acc = 0L
    out.foreach { case (_, dlt, n) => acc += dlt; assert(acc == n) }
  }

  test("q_pmi_cooccur: doc-frequency bounds hold and PMI matches a " +
    "direct computation") {
    val docs = TableLoader.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet)
    val nDocs = docs.length.toDouble
    val df = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, v) => w -> v.length.toLong }
    val top = df.toSeq.sortBy { case (w, c) => (-c, w) }.take(30).toMap
    val out = SparkEntry.queries("q_pmi_cooccur")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.nonEmpty)
    val expected = (for {
      (w1, c1) <- top.toSeq
      (w2, c2) <- top.toSeq if w1 < w2
      cab = docs.count { case (_, ws) => ws(w1) && ws(w2) }.toLong
      if cab >= 5
    } yield (w1, w2) -> ((cab, math.log(cab * nDocs / (c1 * c2)))))
      .toMap
    assert(out.keySet == expected.keySet)
    out.foreach { case (k, (cab, pmi)) =>
      assert(cab == expected(k)._1, s"$k c_ab")
      assert(math.abs(pmi - expected(k)._2) < 5e-4, s"$k pmi")
      assert(cab <= math.min(top(k._1), top(k._2)), s"$k bound")
    }
  }

  test("q_lag_features matches a direct per-user sliding computation") {
    val out = SparkEntry.queries("q_lag_features")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap
    ev.groupBy(_._2).values.foreach { rows =>
      val s = rows.sortBy(r => (micros(r._4), r._1)).toIndexedSeq
      s.indices.foreach { i =>
        val (lag1, mean5, gap) = out(s(i)._1)
        assert(lag1 == (if (i >= 1) Some(BigDecimal(s(i - 1)._5)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) else None))
        val win = s.slice(math.max(0, i - 4), i + 1).map(_._5)
        assert(math.abs(mean5 - win.sum / win.size) < 5e-4)
        // µs gap via toInstant (getTime is ms-truncated)
        assert(gap == (if (i >= 1)
          Some(micros(s(i)._4) - micros(s(i - 1)._4)) else None))
      }
    }
  }

  test("q_absorption_prob solves the defining linear system: " +
    "h = r + Q h over independently recomputed transitions") {
    val out = SparkEntry.queries("q_absorption_prob")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.nonEmpty && !out.contains("purchase"))
    out.foreach { case (st, (nOut, direct, h)) =>
      assert(nOut > 0)
      assert(direct >= 0 && direct <= 1)
      assert(h >= direct - 1e-9 && h <= 1.0 + 1e-9,
        s"$st: h=$h below direct=$direct or above 1")
    }
    // independent transition recomputation via per-user replay
    val seqs = TableLoader.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1)
      .values.toSeq
      .flatMap { rows =>
        val s = rows.sortBy(x => (x._2.toInstant, x._3)).map(_._4)
        (s :+ "__end__").sliding(2).map(p => (p(0), p(1))).toSeq
      }
      .filter(_._1 != "purchase")
    val counts = seqs.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val outTot = counts.groupBy(_._1._1).map { case (f, xs) =>
      f -> xs.values.sum }
    // residual of h = r + Q h under the recomputed P
    out.foreach { case (st, (nOut, _, h)) =>
      assert(outTot(st) == nOut, s"$st transition count")
      val rhs = counts.collect {
        case ((f, t), n) if f == st =>
          val p = n.toDouble / outTot(f)
          if (t == "purchase") p
          else out.get(t).map(p * _._3).getOrElse(0.0)
      }.sum
      assert(math.abs(h - rhs) < 5e-6,
        s"$st: h=$h but r+Qh=$rhs (rounding slack exceeded)")
    }
  }
}
