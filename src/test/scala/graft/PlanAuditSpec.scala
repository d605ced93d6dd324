package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanAudit

/** PlanAudit must report the plan shapes the suite already pins — and
  * its risk list must fire on the known-dangerous patterns and stay
  * quiet on the scale-safe headliners. */
class PlanAuditSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  private def auditOf(name: String) =
    PlanAudit.of(SparkEntry.queries(name)(spark, sfDir))

  test("q_agg_basic: bounded shuffles, pushed filter, no risks") {
    val a = auditOf("q_agg_basic")
    assert(a.shuffles <= 2, a.render)
    assert(a.cartesians == 0 && a.unpartitionedWindows == 0)
    assert(a.scans.nonEmpty && a.scans.forall(_.pushedFilters >= 0))
    assert(a.risks.isEmpty, a.render)
  }

  test("q_join_inner: dims broadcast, no cartesian, no risks") {
    val a = auditOf("q_join_inner")
    assert(a.broadcasts >= 1, a.render)
    assert(a.cartesians == 0)
    assert(a.risks.isEmpty, a.render)
  }

  test("q_join_cross: the cartesian risk fires") {
    val a = auditOf("q_join_cross")
    assert(a.cartesians + a.nestedLoopJoins >= 1, a.render)
    assert(a.risks.nonEmpty)
  }

  test("q_spearman_corr: bounded-grain unpartitioned window is visible") {
    val a = auditOf("q_spearman_corr")
    assert(a.unpartitionedWindows >= 1, a.render)
    assert(a.risks.exists(_.contains("unpartitioned")))
  }

  test("q_window_rank: partitioned window carries no window risk") {
    val a = auditOf("q_window_rank")
    assert(a.windows >= 1 && a.unpartitionedWindows == 0, a.render)
    assert(!a.risks.exists(_.contains("unpartitioned")))
  }

  test("render produces the one-screen report") {
    val r = auditOf("q_agg_basic").render
    assert(r.contains("shuffles=") && r.contains("scans:") &&
      r.contains("risks:"))
  }
}
