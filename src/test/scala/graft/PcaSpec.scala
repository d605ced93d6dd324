package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PcaQueries

/** Linear-algebra invariants for the distributed PCA (no oracle
  * possible — eigendecomposition is not SQL-expressible). */
class PcaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("jacobi solves a closed-form case exactly") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val e = PcaQueries.jacobiEigen(a)
    assert(math.abs(e(0) - 3.0) < 1e-12 && math.abs(e(1) - 1.0) < 1e-12)
    // diag(5, 2, 7) in any symmetric disguise: rotate by a known
    // orthogonal matrix and recover the spectrum
    val d = Array(5.0, 2.0, 7.0)
    val theta = 0.3
    val r = Array(
      Array(math.cos(theta), -math.sin(theta), 0.0),
      Array(math.sin(theta), math.cos(theta), 0.0),
      Array(0.0, 0.0, 1.0))
    val m = Array.tabulate(3, 3) { (i, j) =>
      (0 until 3).map(k => r(i)(k) * d(k) * r(j)(k)).sum
    }
    val e3 = PcaQueries.jacobiEigen(m)
    assert(e3.zip(Array(7.0, 5.0, 2.0))
      .forall { case (x, y) => math.abs(x - y) < 1e-10 })
  }

  test("spectrum is PSD, non-increasing, and sums to the trace") {
    val (cov, n) = PcaQueries.covarianceMatrix(spark, sfDir)
    assert(n == 500)
    val eig = PcaQueries.jacobiEigen(cov)
    val trace = (0 until cov.length).map(i => cov(i)(i)).sum
    assert(math.abs(eig.sum - trace) < 1e-9 * math.max(1.0, trace),
      s"trace ${trace} != eigensum ${eig.sum}")
    eig.foreach(e => assert(e > -1e-9, s"negative eigenvalue $e"))
    eig.sliding(2).foreach { w =>
      assert(w(0) >= w(1) - 1e-12, "spectrum not sorted")
    }
  }

  test("q_embed_pca: 16 rows, ratios consistent and cumulative") {
    val rows = SparkEntry.queries("q_embed_pca")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.length == 16)
    assert(rows.map(_._1).toSeq == (1L to 16L))
    var cum = 0.0
    rows.foreach { case (_, ev, ratio, cr) =>
      assert(ev >= 0.0 && ratio >= 0.0 && ratio <= 1.0)
      cum += ratio
      assert(math.abs(cr - cum) < 5e-6, s"cum_ratio drifted: $cr vs $cum")
    }
    // embeddings are roughly isotropic synthetic noise — no single
    // component should swallow the space, and 16 of 64 should carry
    // a meaningful chunk
    assert(rows.head._3 < 0.5, "degenerate dominant component")
    assert(rows.last._4 > 0.1, "top-16 carry almost nothing")
  }

  test("deterministic across runs (quantized integer moments)") {
    val a = SparkEntry.queries("q_embed_pca")(spark, sfDir).collect()
    val b = SparkEntry.queries("q_embed_pca")(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
  }
}
