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
}
