package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableLoader

/** HLL sketch invariants (no oracle possible — the sketch binary is
  * engine-specific): merge identity and error bound vs exact counts. */
class SketchSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.session

  test("union of per-group sketches equals the sketch of the union") {
    val ev = TableLoader.events(spark, sfDir)
    val merged = SparkEntry.queries("q_hll_sketch_merge")(spark, sfDir)
      .filter(col("event_type") === "_all_")
      .head().getAs[Long]("distinct_users")
    val direct = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    assert(merged == direct,
      s"register-wise max must be lossless: merged=$merged direct=$direct")
  }

  test("KLL quantiles within normalized rank error of exact, " +
    "through the per-type and re-merged global paths") {
    val ev = TableLoader.events(spark, sfDir)
    val n = ev.count()
    val rows = SparkEntry.queries("q_kll_quantiles")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.contains("_all_") && rows.size >= 2)
    // k=200 one-sided normalized rank error ~1.65%; allow 2% of rank,
    // converted to a VALUE tolerance via exact quantiles at p ± 2%
    val (p50, p90, p99) = rows("_all_")
    val exact = ev.agg(expr(
      """percentile(value,
        |  array(0.48,0.52, 0.88,0.92, 0.97,1.0))""".stripMargin))
      .head().getSeq[Double](0)
    assert(p50 >= exact(0) && p50 <= exact(1),
      s"p50 $p50 outside [${exact(0)}, ${exact(1)}]")
    assert(p90 >= exact(2) && p90 <= exact(3),
      s"p90 $p90 outside [${exact(2)}, ${exact(3)}]")
    assert(p99 >= exact(4) && p99 <= exact(5),
      s"p99 $p99 outside [${exact(4)}, ${exact(5)}]")
    assert(n >= 10000, "fixture must be big enough for the bound")
  }

  test("KLL blobs materialize, persist, and re-merge via SQL functions") {
    GraftExtensions.register(spark)
    TableLoader.events(spark, sfDir)
      .createOrReplaceTempView("ev_kll")
    // build per-type blobs, round-trip through a parquet 'snapshot',
    // then union them with kll_merge — the incremental re-merge path
    val dir = java.nio.file.Files
      .createTempDirectory("kll_snap").toString
    spark.sql(
      """SELECT event_type, kll_sketch(value) AS sk
        |FROM ev_kll GROUP BY event_type""".stripMargin)
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .selectExpr(
        "kll_quantiles(kll_merge(sk), array(0.5D)) AS qs")
      .head().getSeq[Double](0).head
    val exact = TableLoader.events(spark, sfDir)
      .agg(expr("percentile(value, array(0.48, 0.52))"))
      .head().getSeq[Double](0)
    assert(merged >= exact(0) && merged <= exact(1),
      s"re-merged p50 $merged outside [${exact(0)}, ${exact(1)}]")
  }

  test("CMS estimates are exact-or-over within the eps*N bound") {
    val ev = TableLoader.events(spark, sfDir)
    val n = ev.count()
    val exact = ev.groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = SparkEntry.queries("q_cms_freq")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty)
    est.foreach { case (u, e) =>
      val x = exact(u)
      assert(e >= x, s"CMS must never underestimate: user $u $e < $x")
      assert(e <= x + (0.001 * n).toLong + 1,
        s"user $u: estimate $e beyond eps*N of exact $x")
    }
  }

  test("estimates within 5% of exact distinct counts") {
    val ev = TableLoader.events(spark, sfDir)
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap +
      ("_all_" -> ev.select(countDistinct(col("user_id"))).head().getLong(0))
    val est = SparkEntry.queries("q_hll_sketch_merge")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("distinct_users")).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (k, e) =>
      val x = exact(k)
      assert(math.abs(e - x).toDouble / x < 0.05,
        s"$k: estimate $e vs exact $x")
    }
  }

  test("theta overlap estimates match exact distinct intersections") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_theta_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.size == 10) // C(5,2) event-type pairs
    val sets = TableLoader.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    out.foreach { case ((a, b), (ea, eb, eab)) =>
      val (xa, xb) = (sets(a), sets(b))
      def close(est: Double, exact: Int) =
        math.abs(est - exact) <= math.max(2.0, 0.05 * exact)
      assert(close(ea, xa.size), s"$a: $ea vs ${xa.size}")
      assert(close(eb, xb.size), s"$b: $eb vs ${xb.size}")
      assert(close(eab, (xa & xb).size),
        s"$a ∩ $b: $eab vs ${(xa & xb).size}")
    }
  }

  test("theta union of per-day sketch blobs equals the one-shot sketch") {
    import org.apache.spark.sql.functions._
    import graft.functions.ThetaOps
    val ev = TableLoader.events(spark, sfDir)
    val daily = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(ThetaOps.thetaSketch(col("user_id")).as("sk"))
      .agg(ThetaOps.thetaUnion(col("sk")).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val once = ev.agg(ThetaOps.thetaSketch(col("user_id")).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val exact = ev.select(col("user_id")).distinct().count()
    assert(math.abs(ThetaOps.estimate(daily) -
      ThetaOps.estimate(once)) < 1e-6)
    assert(math.abs(ThetaOps.estimate(once) - exact) <=
      math.max(2.0, 0.05 * exact))
  }
}
