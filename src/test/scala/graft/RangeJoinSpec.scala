package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** The binned range join must be output-equivalent to the naive
  * BETWEEN join for every bin width — the rewrite is a physical
  * optimization, never a semantic change. Checked on seeded random
  * intervals (overlapping, touching, negative coordinates) across
  * widths bracketing the interval span, plus the degenerate cases.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private lazy val points = (1 to 500)
    .map(i => (i.toLong, rng.nextLong(2000) - 1000))
    .toDF("pid", "p")
  private lazy val intervals = (1 to 80).map { i =>
    val lo = rng.nextLong(1800) - 900
    (i.toLong, lo, lo + rng.nextLong(120))
  }.toDF("iid", "lo", "hi")

  private def naive = points.join(intervals,
    col("p") >= col("lo") && col("p") <= col("hi"))
    .select(col("pid"), col("iid")).collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("binned join equals the naive BETWEEN join for widths " +
    "below, at, and far above the interval span") {
    val want = naive
    assert(want.nonEmpty, "fixture must produce matches")
    for (w <- Seq(1L, 7L, 64L, 121L, 5000L)) {
      val got = RangeJoin.binnedPointInterval(
        points, "p", intervals, "lo", "hi", w)
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"width $w: ${got.size} vs ${want.size} pairs")
    }
  }

  test("each qualifying pair appears exactly once (no bin-boundary " +
    "duplicates)") {
    val rows = RangeJoin.binnedPointInterval(
      points, "p", intervals, "lo", "hi", 16L)
      .groupBy(col("pid"), col("iid")).count()
      .filter(col("count") > 1).count()
    assert(rows == 0L, "a pair met in more than one bin")
  }

  test("rejects a non-positive bin width") {
    intercept[IllegalArgumentException] {
      RangeJoin.binnedPointInterval(points, "p", intervals, "lo", "hi", 0L)
    }
  }
}
