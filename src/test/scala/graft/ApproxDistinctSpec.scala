package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableLoader

/** q_agg_approx_distinct has no oracle (HLL sketches are
  * engine-specific); assert the declared rsd bound against the exact
  * count instead (SURVEY.md §2.4, §5.3). */
class ApproxDistinctSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  test("approx_count_distinct within 5x rsd of exact") {
    val ev = TableLoader.events(spark, sfDir)
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
    val approx = SparkEntry.queries("q_agg_approx_distinct")(spark, sfDir)
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact").toDouble
      assert(math.abs(a - e) / e <= 0.10,
        s"${r.getAs[String]("event_type")}: approx=$a exact=$e")
    }
  }
}
