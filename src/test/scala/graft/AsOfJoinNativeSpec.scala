package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOfJoinExec, AsOfJoinOps}
import graft.sources.TableLoader

/** The native as-of operator must agree exactly with the windowed
  * running-max formulation (the q_join_asof engine side, itself
  * oracle-checked against a correlated subquery) — on the real events
  * fixture, on seeded random data with duplicate timestamps and
  * unmatched keys, and with a tolerance. Plus plan-shape checks: the
  * operator plans as AsOfJoinExec fed by one exchange per side, never
  * a nested-loop or cartesian join.
  */
class AsOfJoinNativeSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  /** last click at-or-before each purchase, via the native operator */
  private def nativeForm(tolMicros: Option[Long]): DataFrame = {
    val ev = TableLoader.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts")
    AsOfJoinOps.asof(
      purchases, "ts", clicks, "ts",
      Seq("user_id"), Seq("user_id"), tolMicros)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("ts_r").as("last_click_ts"))
  }

  /** same result via the windowed running max (q_join_asof shape) */
  private def windowForm(tolMicros: Option[Long]): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val base = TableLoader.events(spark, "/root/testdata/sf0.001")
      .withColumn("last_click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
    val clipped = tolMicros match {
      case Some(t) => base.withColumn("last_click_ts",
        when(unix_micros(col("ts")) - unix_micros(col("last_click_ts"))
          <= t, col("last_click_ts")))
      case None => base
    }
    clipped.select("event_id", "user_id", "ts", "last_click_ts")
  }

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Any](2).toString,
      Option(r.getAs[Any](3)).map(_.toString))).toSet

  test("native as-of equals the windowed formulation on real events") {
    val got = rows(nativeForm(None))
    val want = rows(windowForm(None))
    assert(want.exists(_._4.isDefined), "fixture must produce matches")
    assert(want.exists(_._4.isEmpty),
      "fixture must produce unmatched purchases")
    assert(got == want)
  }

  test("tolerance clips matches exactly like the windowed per-row bound") {
    val hour = 3600L * 1000000L
    val got = rows(nativeForm(Some(hour)))
    val want = rows(windowForm(Some(hour)))
    assert(want.exists(_._4.isEmpty), "tolerance must null some matches")
    assert(got == want)
  }

  test("random data: duplicate times, unmatched keys, null payloads") {
    val rng = new scala.util.Random(7)
    // left: 400 probes over 12 keys; right: 300 quotes over 14 keys —
    // times collide often (mod 50 buckets)
    val probes = (1 to 400).map { i =>
      (i.toLong, (rng.nextInt(12) + 1).toLong,
        new Timestamp(1700000000000L + rng.nextInt(50) * 1000L))
    }.toDF("pid", "k", "t")
    val quotes = (1 to 300).map { i =>
      ((rng.nextInt(14) + 1).toLong,
        new Timestamp(1700000000000L + rng.nextInt(50) * 1000L),
        i.toDouble)
    }.toDF("k", "t", "v")

    val native = AsOfJoinOps.asof(
        probes, "t", quotes, "t", Seq("k"), Seq("k"), None)
      .select(col("pid"), col("t_r"))
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[Any](1)).map(_.toString))).toSet

    // oracle: max quote time <= probe time per key (matched TIME is
    // unique even when payload ties — the documented determinism rule)
    val w = Window.partitionBy(col("k")).orderBy(col("t"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val want = probes.select(col("pid"), col("k"), col("t"))
      .unionByName(quotes.select(col("k"), col("t"))
        .withColumn("pid", lit(null).cast("long")),
        allowMissingColumns = true)
      .withColumn("qt", max(when(col("pid").isNull, col("t"))).over(w))
      .filter(col("pid").isNotNull)
      .select(col("pid"), col("qt"))
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[Any](1)).map(_.toString))).toSet
    assert(native == want)
  }

  test("plan: AsOfJoinExec with one exchange per side, no nested loop") {
    val df = nativeForm(None)
    df.collect() // materialize through AQE so the final plan is real
    val plan = df.queryExecution.executedPlan
    val asofs = collect(plan) { case e: AsOfJoinExec => e }
    assert(asofs.size == 1)
    val s = plan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"))
    // count nodes in the FINAL plan tree (plan.toString also renders
    // AQE's Initial Plan section, double-counting)
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        e
    }
    assert(exchanges.size == 2,
      s"expected exactly one shuffle per side, got ${exchanges.size}\n$s")
  }

  test("forward direction equals the min-over-following window form, " +
    "with and without tolerance") {
    val ev = TableLoader.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts")
    val wFwd = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val base = ev.withColumn("next_click_ts",
        min(when(col("event_type") === "click", col("ts"))).over(wFwd))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "next_click_ts")
    for (tol <- Seq(None, Some(3600L * 1000000L))) {
      val native = AsOfJoinOps.asof(
          purchases, "ts", clicks, "ts", Seq("user_id"), Seq("user_id"),
          toleranceMicros = tol, direction = "forward")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("ts_r").as("next_click_ts"))
      val want = tol match {
        case Some(t) => base.withColumn("next_click_ts",
          when(unix_micros(col("next_click_ts")) - unix_micros(col("ts"))
            <= t, col("next_click_ts")))
        case None => base
      }
      assert(rows(native) == rows(want), s"tolerance=$tol")
      assert(rows(want).exists(_._4.isDefined), "must have matches")
      assert(rows(want).exists(_._4.isEmpty), "must have non-matches")
    }
  }

  test("strategy self-registration is idempotent") {
    nativeForm(None).collect()
    nativeForm(None).collect()
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    assert(cs.experimental.extraStrategies
      .count(_ eq graft.plans.AsOfJoinStrategy) == 1)
  }
}
