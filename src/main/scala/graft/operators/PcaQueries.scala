package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

import graft.QDef
import graft.sources.TableLoader._

/** Distributed PCA over the embedding corpus — the spectral diagnostic
  * a training pipeline runs on its vector space (anisotropy, intrinsic
  * dimensionality, how many components carry the variance, whether a
  * JL/PQ compression budget is safe).
  *
  * Scale split, the only one that works at 100 TB:
  *   - the DATA-sized work is one pass building the d×d second-moment
  *     (gram) matrix and the d-vector of sums — per-row upper-triangle
  *     outer products, QUANTIZED to integer micro-units so the
  *     cross-row sums are addition-order-independent (the exact-moment
  *     idiom the suite uses everywhere), exploded to (j, k, q) scalar
  *     rows and hash-aggregated: ONE shuffle whose cardinality is
  *     d(d+1)/2 + d = 2 144 groups, independent of corpus size;
  *   - the DRIVER-sized work is the 64×64 symmetric eigensolve
  *     (cyclic Jacobi, deterministic, microseconds) over the collected
  *     moment table — the same bounded-state justification as the IVF
  *     centroids.
  *
  * No DuckDB oracle: an eigendecomposition is not SQL-expressible.
  * PcaSpec pins the linear-algebra invariants instead: trace identity,
  * PSD spectrum, non-increasing order, Jacobi vs a closed-form 2×2/3×3
  * case, and run-to-run determinism (guaranteed by the quantized
  * integer moments — double summation order never matters).
  */
object PcaQueries {

  private val dim = 64
  private val scaleQ = 1e6

  /** Cyclic Jacobi eigenvalues of a symmetric matrix (upper triangle
    * given as a(j)(k)); deterministic sweep order, so identical inputs
    * give bit-identical spectra. */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]], maxSweeps: Int = 64): Array[Double] = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // sign(0) must be +1 here: equal diagonal entries need the
            // full 45-degree rotation, not a no-op
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sweep += 1
    }
    Array.tabulate(n)(i => a(i)(i)).sortBy(-_)
  }

  /** Covariance matrix of the embedding corpus from quantized integer
    * moments (exposed for the spec's trace cross-check).
    *
    * This is the one treeAggregate-shaped workload in the registry, and
    * the per-partition imperative form is the honest 100 TB plan: each
    * partition folds its rows into ONE d(d+1)/2-long integer moment
    * array (plus d first-moment sums), so only numPartitions rows —
    * 32 × ~17 KB locally, a few thousand on a real cluster — ever
    * cross to the driver. The first cut of this pass exploded
    * per-row (j, k, q) structs through a hash aggregate: same answer,
    * ONE SHUFFLE OF n·d(d+1)/2 ROWS (10.4M at sf0.1, measured 3.5 s vs
    * 0.6 s for this form). Products are quantized to 1e-6 integer
    * units before summation, so the cross-row addition is
    * order-independent — bit-identical spectra on every run. */
  private[graft] def covarianceMatrix(
      s: SparkSession, d: String): (Array[Array[Double]], Long) = {
    import s.implicits._
    val nPairs = dim * (dim + 1) / 2
    val parts = embeddings(s, d)
      .select(col("embedding")).as[Seq[Float]]
      .mapPartitions { it =>
        val m = new Array[Long](nPairs)
        val sv = new Array[Long](dim)
        var n = 0L
        val x = new Array[Double](dim)
        while (it.hasNext) {
          val row = it.next()
          var j = 0
          while (j < dim) { x(j) = row(j).toDouble; j += 1 }
          var idx = 0
          j = 0
          while (j < dim) {
            sv(j) += Math.round(x(j) * scaleQ)
            var k = j
            while (k < dim) {
              m(idx) += Math.round(x(j) * x(k) * scaleQ)
              k += 1; idx += 1
            }
            j += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator.single((m, sv, n))
      }
      .collect()
    val m = new Array[Long](nPairs)
    val sv = new Array[Long](dim)
    var n = 0L
    parts.foreach { case (pm, psv, pn) =>
      var i = 0
      while (i < nPairs) { m(i) += pm(i); i += 1 }
      i = 0
      while (i < dim) { sv(i) += psv(i); i += 1 }
      n += pn
    }
    val mu = Array.tabulate(dim)(j => sv(j) / scaleQ / n)
    val upper = Array.ofDim[Long](dim, dim)
    var idx = 0
    for (j <- 0 until dim; k <- j until dim) {
      upper(j)(k) = m(idx); idx += 1
    }
    val cov = Array.tabulate(dim, dim) { (j, k) =>
      val (lo, hi) = if (j <= k) (j, k) else (k, j)
      upper(lo)(hi) / scaleQ / n - mu(j) * mu(k)
    }
    (cov, n)
  }

  /** Top-16 principal spectrum of the embedding covariance: eigenvalue,
    * explained-variance ratio, cumulative ratio per component. */
  val qEmbedPca: QDef = QDef.noOracle("q_embed_pca") { (s, d) =>
    val (cov, _) = covarianceMatrix(s, d)
    val eig = jacobiEigen(cov)
    val total = eig.sum
    var cum = 0.0
    val rows = eig.take(16).zipWithIndex.map { case (ev, i) =>
      cum += ev
      (i + 1L, ev, ev / total, cum / total)
    }
    import s.implicits._
    rows.toSeq.toDF("component", "eigenvalue", "ratio", "cum_ratio")
      .select(col("component"),
        round(col("eigenvalue"), 6).as("eigenvalue"),
        round(col("ratio"), 6).as("ratio"),
        round(col("cum_ratio"), 6).as("cum_ratio"))
      .orderBy(col("component"))
  }

  val defs: Seq[QDef] = Seq(qEmbedPca)
}
