package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the probe-adoption guards (Bench.adoptProbe, r13) against the
  * exact failure shapes that produced the weak set in rounds 11–12
  * while the logic lived inline in the sweep:
  *   - r12: a contaminated probe window wrote 12.5 s over
  *     q_user_holdout's honest 0.23 s (runs 12.5/14.5/0.596 — the
  *     spread guard's motivating case);
  *   - r12: warm-tail FAST solo medians became committed baselines
  *     (q_kneser_ney 0.114 s committed vs 0.505 s honest) — cured by
  *     the two-probe confirmation adopting the SLOWER median;
  *   - r13 run evidence: two warm-tail probes that DISAGREE (0.267 vs
  *     0.139 s) must not rebaseline — the later full sweep measured
  *     the committed 0.6 s as honest.
  */
class BenchAdoptionSpec extends AnyFunSuite {

  private val cores = 32

  private def run(t: Double, stealMs: Long = 0L): Bench.RunStat =
    Bench.RunStat(t, 0L, 0, 0L, 0L, 0.0, stealMs, 0L, 0, 0L)

  /** warm-up first, then timed runs — measure()'s raw order. */
  private def raw(warm: Double, timed: Double*): Seq[Bench.RunStat] =
    run(warm) +: timed.map(run(_))

  test("r12 q_user_holdout shape: a probe whose own runs spread 21x " +
    "disqualifies itself — committed retained, loud message") {
    val (adopted, log) = Bench.adoptProbe("q_user_holdout", 12.5,
      raw(12.5, 14.5, 12.5, 0.596), comm = 0.194,
      second = sys.error("second probe must not run"), cores)
    assert(adopted.isEmpty)
    assert(log.exists(_.contains("DISQUALIFIED")), log)
  }

  test("slow rebaseline adopts only when even the fastest run " +
    "confirms (>2x committed); mixed evidence retains committed") {
    // r13 healing case: q_label_prop honest 2.40 s vs committed 0.441
    val (a1, l1) = Bench.adoptProbe("q_label_prop", 2.40,
      raw(2.5, 2.45, 2.40, 2.38), comm = 0.441,
      second = sys.error("slow path needs no second probe"), cores)
    assert(a1.contains(2.40) && l1.isEmpty)
    // mixed: one run at 0.6 s is NOT >2x of 0.441 — retain
    val (a2, l2) = Bench.adoptProbe("q_x", 2.40,
      raw(2.5, 2.45, 2.40, 0.85), comm = 0.441,
      second = sys.error("unused"), cores)
    assert(a2.isEmpty && l2.exists(_.contains("SLOW probe mixed")))
  }

  test("FAST adoption needs a clean second probe agreeing within " +
    "1.5x and adopts the SLOWER median") {
    val (a, l) = Bench.adoptProbe("q_kneser_ney", 0.114,
      raw(0.12, 0.114, 0.115, 0.113), comm = 0.505,
      second = Some((0.150, raw(0.15, 0.150, 0.151, 0.149))), cores)
    assert(a.contains(0.150), a) // slower of the two
    assert(l.exists(_.contains("confirmed twice")))
  }

  test("FAST probes that disagree >1.5x do not rebaseline (two " +
    "warm-tail flukes are not confirmation)") {
    val (a, l) = Bench.adoptProbe("q_chi2_contingency", 0.267,
      raw(0.3, 0.267, 0.270, 0.264), comm = 0.638,
      second = Some((0.139, raw(0.14, 0.139, 0.140, 0.138))), cores)
    assert(a.isEmpty)
    assert(l.exists(_.contains("unconfirmed")), l)
  }

  test("FAST path with a steal-dirty or spread-wild second probe " +
    "retains committed") {
    val dirty = Some((0.150,
      raw(0.15, 0.150, 0.151, 0.149).map(_.copy(stealMs = 100000L))))
    val (a1, _) = Bench.adoptProbe("q_y", 0.114,
      raw(0.12, 0.114, 0.115, 0.113), comm = 0.505, dirty, cores)
    assert(a1.isEmpty)
    val wild = Some((0.150, raw(0.15, 0.450, 0.150, 0.050)))
    val (a2, _) = Bench.adoptProbe("q_y", 0.114,
      raw(0.12, 0.114, 0.115, 0.113), comm = 0.505, wild, cores)
    assert(a2.isEmpty)
  }

  test("the 0.8-2x band refreshes directly; steal-dirty probes and " +
    "failed medians adopt nothing; all-failed runs cannot crash") {
    val (a1, l1) = Bench.adoptProbe("q_z", 0.5,
      raw(0.5, 0.5, 0.51, 0.49), comm = 0.45,
      second = sys.error("unused"), cores)
    assert(a1.contains(0.5) && l1.isEmpty)
    val (a2, _) = Bench.adoptProbe("q_z", 0.5,
      raw(0.5, 0.5, 0.51, 0.49).map(_.copy(stealMs = 1000000L)),
      comm = 0.45, second = sys.error("unused"), cores)
    assert(a2.isEmpty)
    val (a3, _) = Bench.adoptProbe("q_z", -1.0,
      raw(0.5, -1.0, -1.0, -1.0), comm = 0.45,
      second = sys.error("unused"), cores)
    assert(a3.isEmpty)
    // median reported >0 but every timed run failed: the spread
    // guard must disqualify WITHOUT throwing on an empty run list
    val (a4, l4) = Bench.adoptProbe("q_z", 0.5,
      Seq(run(0.5), run(-1.0), run(-1.0), run(-1.0)), comm = 0.45,
      second = sys.error("unused"), cores)
    assert(a4.isEmpty)
    // wallMs of zero timed runs → cleanSteal false → silent keep
    assert(l4.isEmpty || l4.exists(_.contains("DISQUALIFIED")))
  }

  test("a new query (no committed median) refreshes to its probe") {
    val (a, l) = Bench.adoptProbe("q_new", 0.7,
      raw(0.8, 0.7, 0.72, 0.69), comm = 0.0,
      second = sys.error("unused"), cores)
    assert(a.contains(0.7) && l.isEmpty)
  }
}
