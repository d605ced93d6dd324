package graft.functions

import org.apache.spark.sql.Row

/** Chunked exact-cosine pair kernel (optimization round 2, guide §2.3 +
  * §8): the all-pairs cosine queries used to materialize one joined row
  * per candidate pair — two 64-float arrays plus norms per row, ~20 M
  * rows × ~0.5 KB at the 10× probe — only to reduce each row to a
  * single double. The 10× growth measured 25× (BENCH_PROBE_r14).
  *
  * This kernel moves the heavy bytes once per CHUNK pair instead of
  * once per vector pair: vectors are grouped into bounded chunks within
  * each label block, chunk pairs (a tiny equi-join on label) cross the
  * shuffle as two packed arrays, and the O(|a|·|b|) dot products run in
  * one tight primitive loop per chunk pair — the §8 "decide with small
  * rows, move big rows once" shape applied to pair scoring, with the
  * §4.2 "hand whole batches to compiled code" rule for the per-pair
  * arithmetic (a row-per-pair join cannot beat a fused loop here; the
  * join's own materialization IS the cost being removed).
  *
  * EXACTNESS CONTRACT (oracle-pinned): every unordered pair within a
  * label is enumerated exactly once (same-chunk: i<j positions;
  * cross-chunk: full bipartite, chunk_a < chunk_b), and the cosine is
  * computed with the IDENTICAL floating-point steps as the join form it
  * replaces — dot = Σ_{i=0..d-1} (double)a[i]·(double)b[i] accumulated
  * strictly left-to-right (the [[DotProduct]] codegen loop), divided by
  * the pre-computed norm product. IEEE multiply is commutative, so
  * nrm_a·nrm_b is bit-identical regardless of which side of the pair
  * arrived in which chunk. Results are therefore bit-identical to the
  * previous q_sim_cosine / q_dedup_embedding pair frames.
  */
object CosineChunkKernel {

  /** Unpacked chunk: parallel arrays of (vec_id, embedding, norm). */
  private final class Chunk(val ids: Array[Long],
      val vecs: Array[Array[Float]], val nrms: Array[Double])

  private def unpack(ms: Seq[Row]): Chunk = {
    val n = ms.size
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    val nrms = new Array[Double](n)
    var i = 0
    val it = ms.iterator
    while (it.hasNext) {
      val r = it.next()
      ids(i) = r.getLong(0)
      val e = r.getSeq[Float](1)
      val arr = new Array[Float](e.length)
      var j = 0
      val eit = e.iterator
      while (eit.hasNext) { arr(j) = eit.next(); j += 1 }
      vecs(i) = arr
      nrms(i) = r.getDouble(2)
      i += 1
    }
    new Chunk(ids, vecs, nrms)
  }

  /** Strict left-to-right double fold — the [[DotProduct]] loop. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"cosine chunk kernel: dimension mismatch (${a.length} vs ${b.length})")
    var s = 0.0
    var i = 0
    while (i < a.length) {
      s += a(i).toDouble * b(i).toDouble
      i += 1
    }
    s
  }

  /** All pair cosines of one chunk pair in parallel arrays; pairs are
    * oriented (min id, max id) so every unordered pair appears with
    * vec_a < vec_b exactly as the join form emitted it. */
  private final class Pairs(n: Int) {
    val pa = new Array[Long](n)
    val pb = new Array[Long](n)
    val cos = new Array[Double](n)
    var m = 0
    def add(x: Long, y: Long, c: Double): Unit = {
      if (x < y) { pa(m) = x; pb(m) = y } else { pa(m) = y; pb(m) = x }
      cos(m) = c
      m += 1
    }
  }

  private def enumerate(a: Seq[Row], b: Seq[Row], sameChunk: Boolean): Pairs = {
    val ca = unpack(a)
    val cb = if (sameChunk) ca else unpack(b)
    val na = ca.ids.length
    val nb = cb.ids.length
    val total = if (sameChunk) na * (na - 1) / 2 else na * nb
    val out = new Pairs(total)
    var i = 0
    while (i < na) {
      var j = if (sameChunk) i + 1 else 0
      while (j < nb) {
        val c = dot(ca.vecs(i), cb.vecs(j)) / (ca.nrms(i) * cb.nrms(j))
        out.add(ca.ids(i), cb.ids(j), c)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Top-k candidate pairs of one chunk pair, with a PROVABLY SAFE raw
    * cutoff: keep every pair with cos ≥ L − 1e-4 where L is the k-th
    * largest raw cosine in this chunk pair (all pairs when ≤ k exist).
    *
    * Why the global rounded top-k survives local raw pruning: the
    * declared query orders by ROUND(cos, 4) with (vec_a, vec_b)
    * tie-break. For any dropped pair P there are ≥ k kept pairs Q in
    * the same chunk pair with raw(Q) ≥ L > raw(P) + 1e-4; rounding to
    * the 1e-4 grid moves a value by at most 5e-5 each way, so
    * round(Q) − round(P) ≥ raw(Q) − raw(P) − 1e-4 > 0 — STRICTLY
    * greater, so P is outranked by ≥ k pairs regardless of tie-breaks
    * and can never reach the global rounded top-k. NaN cosines (zero
    * norms — absent from valid data) are always kept so degenerate
    * inputs surface exactly as the join form surfaced them. */
  def topPairs(a: Seq[Row], b: Seq[Row], sameChunk: Boolean,
      k: Int): Seq[(Long, Long, Double)] = {
    val p = enumerate(a, b, sameChunk)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    if (p.m <= k) {
      var i = 0
      while (i < p.m) { out += ((p.pa(i), p.pb(i), p.cos(i))); i += 1 }
    } else {
      val sorted = java.util.Arrays.copyOf(p.cos, p.m)
      java.util.Arrays.sort(sorted)
      val cut = sorted(p.m - k) - 1e-4
      var i = 0
      while (i < p.m) {
        val c = p.cos(i)
        if (c >= cut || java.lang.Double.isNaN(c))
          out += ((p.pa(i), p.pb(i), c))
        i += 1
      }
    }
    out.toSeq
  }

  /** Threshold pairs of one chunk pair: cos ≥ t, the exact predicate
    * the join form applied (NaN fails ≥, matching the old filter). */
  def thresholdPairs(a: Seq[Row], b: Seq[Row], sameChunk: Boolean,
      t: Double): Seq[(Long, Long, Double)] = {
    val p = enumerate(a, b, sameChunk)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var i = 0
    while (i < p.m) {
      if (p.cos(i) >= t) out += ((p.pa(i), p.pb(i), p.cos(i)))
      i += 1
    }
    out.toSeq
  }
}
