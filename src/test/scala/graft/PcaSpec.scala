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
    val (cov, _, n) = PcaQueries.covarianceMatrix(spark, sfDir)
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

  test("eigenvectors are orthonormal and diagonalize the covariance") {
    val (cov, _, _) = PcaQueries.covarianceMatrix(spark, sfDir)
    val (vals, vecs) = PcaQueries.jacobiEigenSystem(cov)
    val n = cov.length
    for (a <- 0 until n; b <- a until n) {
      val dot = (0 until n).map(i => vecs(a)(i) * vecs(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"V row $a . row $b = $dot")
    }
    // Rayleigh quotient of each eigenvector reproduces its eigenvalue
    for (c <- 0 until 8) {
      val v = vecs(c)
      val av = Array.tabulate(n)(i =>
        (0 until n).map(j => cov(i)(j) * v(j)).sum)
      val rq = (0 until n).map(i => v(i) * av(i)).sum
      assert(math.abs(rq - vals(c)) < 1e-9 * math.max(1.0, vals(c)),
        s"component $c: rq $rq vs ${vals(c)}")
    }
  }

  test("q_pca_project: captured ratios valid; mean captured variance " +
    "matches the top-8 spectrum share") {
    val rows = SparkEntry.queries("q_pca_project")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 500)
    rows.foreach { case (_, pn, cr) =>
      assert(pn >= 0.0 && cr >= 0.0 && cr <= 1.0 + 1e-9)
    }
    val (cov, _, _) = PcaQueries.covarianceMatrix(spark, sfDir)
    val (vals, _) = PcaQueries.jacobiEigenSystem(cov)
    val share = vals.take(8).sum / vals.sum
    // variance-weighted mean of captured ratios ≈ spectrum share; the
    // unweighted mean is a coarser proxy — allow a generous band
    val mean = rows.map(_._3).sum / rows.length
    assert(math.abs(mean - share) < 0.15,
      s"mean captured $mean vs spectrum share $share")
  }

  test("q_mahalanobis: top-20 sorted desc; corpus mean d2 equals dim " +
    "(the trace identity of the sample covariance)") {
    val rows = SparkEntry.queries("q_mahalanobis")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 20)
    rows.sliding(2).foreach { w =>
      assert(w(0)._2 >= w(1)._2, "not sorted by distance")
    }
    rows.foreach { case (_, d2) => assert(d2 >= 0.0) }
    // (1/n) Σ (x−μ)ᵀ Σ̂⁻¹ (x−μ) = trace(Σ̂⁻¹ Σ̂) = dim, exactly, up to
    // the ridge and the 1e-6 quantization — recompute over ALL vectors
    val (cov, mu, n) = PcaQueries.covarianceMatrix(spark, sfDir)
    val dim = cov.length
    val L = Array.ofDim[Double](dim, dim)
    PcaQueries.cholesky(cov, L)
    val e = graft.sources.TableLoader.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val z = new Array[Double](dim)
    var total = 0.0
    e.foreach { x =>
      var i = 0
      while (i < dim) {
        var acc = x(i) - mu(i)
        var t = 0
        while (t < i) { acc -= L(i)(t) * z(t); t += 1 }
        z(i) = acc / L(i)(i)
        total += z(i) * z(i)
        i += 1
      }
    }
    val meanD2 = total / n
    assert(math.abs(meanD2 - dim) < 0.05,
      s"mean d2 $meanD2 != dim $dim")
  }
}
