package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-3 analytic extension pack that
  * the DuckDB hash oracle can't express directly. */
class AnalyticExtSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  test("salted skew join output is identical to the plain join") {
    import graft.sources.TableLoader._
    val plain = lineitem(spark, sfDir)
      .join(orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SparkEntry.queries("q_join_skew_salted")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("batch sessionization agrees with session_window on boundaries") {
    // same 30-minute `diff > gap` rule → identical session-start sets
    val batch = SparkEntry.queries("q_sessionize_batch")(spark, sfDir)
      .select(col("user_id"), col("session_start"))
      .collect().map(r => (r.getLong(0), r.get(1).toString)).toSet
    val stream = SparkEntry.queries("q_stream_session")(spark, sfDir)
      .select(col("user_id"), col("session_start"))
      .collect().map(r => (r.getLong(0), r.get(1).toString)).toSet
    assert(batch == stream)
  }

  test("gap islands are maximal runs of consecutive days") {
    val rows = SparkEntry.queries("q_gap_islands")(spark, sfDir)
      .withColumn("span", datediff(col("island_end"), col("island_start")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val len = r.getAs[Long]("island_len")
      val span = r.getAs[Int]("span")
      assert(span == len - 1,
        s"island ${r.getAs[Long]("o_custkey")}@${r.get(1)}: " +
          s"span $span != len-1 ${len - 1}")
    }
  }

  test("distinct_on keeps exactly one latest row per customer") {
    val df = SparkEntry.queries("q_distinct_on")(spark, sfDir)
    assert(df.groupBy("o_custkey").count().filter(col("count") > 1)
      .isEmpty)
    // keyset = customers that have orders
    val expected = graft.sources.TableLoader.orders(spark, sfDir)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(df.count() == expected)
  }
}
