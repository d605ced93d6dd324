package graft

import org.scalatest.funsuite.AnyFunSuite

/** Error-bound check for the approximate percentile (no oracle — the
  * sketch is engine-specific, so the spec compares against the exact
  * interpolated percentile instead). */
class AggApproxSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.session

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
