package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BinnedRangeJoinRule

/** The auto-binning optimizer rule: off by default, output-invisible
  * and nested-loop-free when enabled on a too-big-to-broadcast range
  * join. Registered here via `spark.experimental.extraOptimizations`
  * (the live-session path; `spark.sql.extensions=graft.GraftExtensions`
  * is the cluster-conf path).
  */
class BinnedRangeRuleSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.session
    if (!s.experimental.extraOptimizations.contains(BinnedRangeJoinRule)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ BinnedRangeJoinRule
    }
    s
  }

  private def rangeJoin(): DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val points = (1 to 400).map(i => (i.toLong, rng.nextLong(1000)))
      .toDF("pid", "p")
    val intervals = (1 to 60).map { i =>
      val lo = rng.nextLong(950)
      (i.toLong, lo, lo + rng.nextLong(60))
    }.toDF("iid", "lo", "hi")
    points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("pid"), col("iid"))
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption
    }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("rule is a no-op with the width conf unset (default plans keep " +
    "the nested-loop form)") {
    val plan = rangeJoin().queryExecution.optimizedPlan
    assert(!plan.toString.contains("__graft_bin_p"),
      s"rule fired without opt-in:\n$plan")
  }

  test("enabled on a too-big-to-broadcast join: plan becomes an equi " +
    "join on the bin (no BroadcastNestedLoopJoin) with identical output") {
    val want = rangeJoin().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    withConf(
      BinnedRangeJoinRule.WidthConf -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // isolate the rewrite: no AQE replanning noise in the asserted plan
      "spark.sql.adaptive.enabled" -> "false") {
      val df = rangeJoin()
      val optimized = df.queryExecution.optimizedPlan
      assert(optimized.toString.contains("__graft_bin_p"),
        s"rewrite did not fire:\n$optimized")
      val bnl = df.queryExecution.executedPlan.collect {
        case b: BroadcastNestedLoopJoinExec => b
      }
      assert(bnl.isEmpty, "nested-loop survived the rewrite")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"${got.size} vs ${want.size} pairs")
    }
  }

  test("a cross-side equality conjunct disables the rewrite (the " +
    "planner already has a hash key)") {
    import spark.implicits._
    val a = (1 to 50).map(i => (i.toLong, i.toLong % 7, i.toLong))
      .toDF("aid", "k", "p")
    val b = (1 to 50).map(i => (i.toLong, i.toLong % 7, i.toLong - 5,
      i.toLong + 5)).toDF("bid", "k2", "lo", "hi")
    withConf(
      BinnedRangeJoinRule.WidthConf -> "8",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = a.join(b, col("k") === col("k2")
        && col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!df.queryExecution.optimizedPlan.toString
        .contains("__graft_bin_p"),
        "rewrite must defer to the existing equality key")
    }
  }
}
