package graft

import org.scalatest.funsuite.AnyFunSuite

/** Error-bound checks for the approximate percentile. The declared
  * query runs in the PROVABLY-EXACT regime (accuracy 500000 ≫ group
  * sizes at gate scales — that's what put it under the DuckDB hash
  * gate in round 11); the purge regime the 100 TB operating point
  * actually hits is pinned here directly: a deliberately tiny
  * accuracy on seeded data must stay inside the GK rank-error
  * guarantee ε·N while being visibly inexact. */
class AggApproxSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.session

  test("purge regime: rank error within the GK bound at accuracy 100") {
    import org.apache.spark.sql.functions._
    val n = 50000
    val acc = 100
    // deterministic, duplicate-heavy values: v = (i*i) mod 9973
    val df = spark.range(n.toLong)
      .select((col("id") * col("id") % 9973).cast("double").as("v"))
    val approx = df
      .agg(percentile_approx(col("v"), lit(0.5), lit(acc)))
      .head().getDouble(0)
    // exact rank of the returned value must be within eps*N of p*N
    val below = df.filter(col("v") < approx).count().toDouble
    val atOrBelow = df.filter(col("v") <= approx).count().toDouble
    val target = 0.5 * n
    val tol = n.toDouble / acc // eps*N = N/accuracy
    assert(below - tol <= target && target <= atOrBelow + tol,
      s"rank window [${below}, ${atOrBelow}] vs target $target ± $tol")
  }

  test("approx median within 2% of exact per priority") {
    val approx = SparkEntry.queries("q_agg_approx_percentile")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = SparkEntry.queries("q_agg_percentiles")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e) / e < 0.02, s"$k: approx=$a exact=$e")
    }
  }
}
