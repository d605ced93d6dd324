package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Product-quantization (PQ) approximate nearest neighbour — the third
  * scale path for similarity search next to sign-LSH
  * (SimilarityQueries.qAnnLsh) and IVF (IvfAnn), implementing the
  * public PQ/ADC scheme (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011).
  *
  * Build: the 64-dim embedding space is split into `m` = 8 subspaces of
  * 8 dims; each subspace gets its own `ksub` = 16-centroid k-means
  * codebook (Spark ML, fixed seeds). Every corpus vector is encoded as
  * 8 4-bit codes — a 64× compression of the 64-float vector, which is
  * the whole point at 100 TB: the encoded corpus (vec_id + 8 bytes)
  * fits where the raw vectors never could, and the scan side of a query
  * reads codes, not floats.
  *
  * Query: asymmetric distance computation (ADC). The query vector is
  * NOT quantized; a per-query 8×16 lookup table of exact
  * query-slice-to-centroid squared distances is built driver-side
  * (m·ksub = 128 doubles — broadcast as literals into codegen) and the
  * approximate distance of every corpus vector is 8 table lookups + 7
  * adds — no float math per dimension. The ADC top-`rerank` candidates
  * are then re-ranked by exact cosine, so reported scores are exact and
  * recall is governed by the candidate budget, mirroring the IVF/LSH
  * twins.
  *
  * Codebooks are trained on L2-normalized vectors (cosine-consistent,
  * same argument as IvfAnn.build: on the unit sphere euclidean² =
  * 2 − 2·cos, and PQ's subspace-sum of squared distances approximates
  * full euclidean²).
  */
object PqAnn {

  val m = 8 // subspaces
  val dsub = 8 // dims per subspace (m * dsub = 64)
  val ksub = 16 // centroids per subspace (4-bit codes)

  final case class Index(
      encoded: DataFrame, // vec_id, codes: array<int>[m] — CODES ONLY
      codebooks: Array[Array[Array[Double]]]) // m × ksub × dsub

  /** Fit (and memoize) the PQ index: m per-subspace codebooks + the
    * encoded corpus. Setup cost, not query cost — `Bench`'s warm-up
    * builds it before any timed run. */
  def build(s: SparkSession, d: String): Index =
    graft.sources.SessionCache.getOrElseUpdate(s, ("pq", d)) {
      // norm computed ONCE per row into a column — embedding it inside
      // the per-element transform lambda would re-evaluate the 64-dim
      // norm for every element (O(d²) per row, the IvfAnn.build lesson)
      // persisted for the build's lifetime: each of the m k-means fits
      // and the encode pass otherwise re-reads the source and re-runs
      // the normalization — 9 redundant scans per build (r11 review)
      val vecs = embeddings(s, d)
        .withColumn("nrm", SimilarityQueries.l2norm(col("embedding")))
        .select(col("vec_id"),
          when(col("nrm") > 0,
            transform(col("embedding"), x => x.cast("double") / col("nrm")))
            .otherwise(transform(col("embedding"), x => x.cast("double")))
            .as("nv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one k-means per subspace over that subspace's 8-dim slice;
      // each fit is a distributed ML job, the model (16×8 doubles) is
      // the only driver-side state — the IVF-centroid pattern
      val models = (0 until m).map { j =>
        new KMeans()
          .setK(ksub).setSeed(42L + j).setMaxIter(10)
          .setFeaturesCol(s"f$j").setPredictionCol(s"code$j")
          .fit(vecs.select(
            array_to_vector(slice(col("nv"), j * dsub + 1, dsub))
              .as(s"f$j")))
      }
      // encode: chained model.transform calls — each adds one 4-bit
      // code column; all stay inside one job over the corpus
      val withSlices = (0 until m).foldLeft(vecs) { (df, j) =>
        df.withColumn(s"f$j",
          array_to_vector(slice(col("nv"), j * dsub + 1, dsub)))
      }
      // codes ONLY: after the ADC/rerank split nothing reads an
      // embedding column from the index, and caching the raw floats
      // next to 8 codes would make the dead column dominate the cache
      // footprint — defeating the 64x-compression point (r11 review)
      val enc = models.foldLeft(withSlices)((df, mod) => mod.transform(df))
        .select(col("vec_id"),
          array((0 until m).map(j => col(s"code$j")): _*).as("codes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      enc.count() // materialize so the build-scoped vecs can release
      vecs.unpersist()
      Index(enc, models.map(_.clusterCenters.map(_.toArray)).toArray)
    }

  /** ADC column for a normalized query: the per-query m×ksub lookup
    * table of exact query-slice-to-centroid squared distances is
    * computed driver-side (128 doubles) and inlined as literal arrays
    * — codegen folds them into constants, so the per-row cost is m
    * lookups + m−1 adds. */
  def adcColumn(
      codebooks: Array[Array[Array[Double]]], q: Array[Double]): Column = {
    val dtab: Array[Array[Double]] = Array.tabulate(m) { j =>
      val qs = q.slice(j * dsub, (j + 1) * dsub)
      codebooks(j).map { c =>
        var acc = 0.0
        var i = 0
        while (i < dsub) { val t = qs(i) - c(i); acc += t * t; i += 1 }
        acc
      }
    }
    (0 until m).map { j =>
      element_at(array(dtab(j).map(lit).toIndexedSeq: _*),
        col("codes")(j) + 1)
    }.reduce(_ + _)
  }

  /** Exact-cosine re-rank of an ADC ranking over (vec_id, adc) ONLY:
    * the ADC scan and its top-`rerank` selection never carry the raw
    * 64-float vectors — that is the whole point of PQ at 100 TB; the
    * ≤ `rerank` survivors broadcast-join the embeddings back for the
    * exact pass. Zero-norm corpus vectors (tolerated by the index
    * build) are excluded here — they have no defined cosine. */
  private def rerankExact(
      s: SparkSession, d: String, qRaw: Array[Float], qn: Double, k: Int,
      rerank: Int, ranked: DataFrame): DataFrame = {
    // the query rides as LITERALS from the one already-collected row —
    // the old crossJoin(broadcast(qv)) re-scanned the embeddings
    // source a second time per query just to rebuild it (r11 review)
    val qvLit = array(qRaw.toIndexedSeq.map(lit(_)): _*)
    val cands = ranked
      .orderBy(col("adc"), col("vec_id")) // TakeOrderedAndProject, not a sort
      .limit(rerank)
      .select(col("vec_id"))
    embeddings(s, d)
      .join(broadcast(cands), "vec_id")
      .withColumn("nrm", SimilarityQueries.l2norm(col("embedding")))
      .where(col("nrm") > 0)
      .select(
        col("vec_id"),
        round(
          SimilarityQueries.dot(col("embedding"), qvLit)
            / (col("nrm") * lit(qn)),
          4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Top-k neighbours of `queryVecId`: ADC scan over the encoded
    * corpus, exact-cosine re-rank of the top-`rerank` candidates. */
  def topK(
      s: SparkSession, d: String, queryVecId: Long, k: Int,
      rerank: Int = 64): DataFrame = {
    val idx = build(s, d)
    val (qRaw, qn, q) = IvfAnn.fetchQuery(s, d, queryVecId)
    rerankExact(s, d, qRaw, qn, k, rerank,
      idx.encoded
        .filter(col("vec_id") =!= queryVecId)
        .select(col("vec_id"), adcColumn(idx.codebooks, q).as("adc")))
  }

  /** IVF-PQ composite (the FAISS-style IVFADC layout from the same
    * public PQ paper): the IVF coarse quantizer routes the query to
    * `nprobe` inverted lists and the ADC scan runs over the PQ codes
    * of those lists ONLY — at 100 TB the scan touches nprobe/k of the
    * corpus and reads 8-byte codes, not 256-byte vectors; the two
    * index structures compose multiplicatively. Exact-cosine re-rank
    * as everywhere. */
  def topKIvfPq(
      s: SparkSession, d: String, queryVecId: Long, k: Int,
      nprobe: Int = 4, rerank: Int = 64): DataFrame = {
    val pq = build(s, d)
    val ivf = IvfAnn.build(s, d)
    // cluster routing + codes in one cached frame (vec_id, cluster,
    // codes, embedding) — derived from the two warmed indexes
    val combined = graft.sources.SessionCache
      .getOrElseUpdate(s, ("ivfpq", d)) {
        ivf.assigned.select(col("vec_id"), col("cluster"))
          .join(pq.encoded, "vec_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    val (qRaw, qn, q) = IvfAnn.fetchQuery(s, d, queryVecId)
    val probed = IvfAnn.nearestCentroids(ivf.centroids, q, nprobe)
    rerankExact(s, d, qRaw, qn, k, rerank,
      combined
        .filter(col("cluster").isin(probed.map(Integer.valueOf): _*)
          && col("vec_id") =!= queryVecId)
        .select(col("vec_id"), adcColumn(pq.codebooks, q).as("adc")))
  }

  /** Declared query: PQ/ADC top-10 for the query vector (no oracle —
    * the codebooks are engine-internal k-means state; PqAnnSpec asserts
    * code validity, recall vs brute force, monotonicity in the rerank
    * budget, and score exactness of the re-rank). */
  val qAnnPq: QDef = QDef.noOracle("q_ann_pq") { (s, d) =>
    topK(s, d, queryVecId = 0L, k = 10)
  }

  /** Declared query: IVF-PQ top-10 (no oracle; PqAnnSpec asserts the
    * candidate set is the probed-lists ∩ ADC ranking, recall vs brute
    * force, and nprobe monotonicity AT A FULL RERANK BUDGET — probed
    * lists are nested in nprobe, but at a FIXED budget more lists can
    * evict a true neighbor from the ADC top-N, so fixed-budget recall
    * is not guaranteed monotone). */
  val qAnnIvfPq: QDef = QDef.noOracle("q_ann_ivf_pq") { (s, d) =>
    topKIvfPq(s, d, queryVecId = 0L, k = 10)
  }

  val defs: Seq[QDef] = Seq(qAnnPq, qAnnIvfPq)
}
