package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** IVF (inverted-file) approximate nearest neighbour — the second
  * scale path for similarity search next to sign-LSH
  * (SimilarityQueries.qAnnLsh), per the driver mandate "an IVF or
  * LSH-bucketed variant".
  *
  * Build: k-means (Spark ML, fixed seed) coarse-quantizes the corpus;
  * each vector lands in one centroid's inverted list (a `cluster`
  * column — at 100 TB this is the partition key, so each list is a
  * co-located shard). Query: probe the `nprobe` nearest centroids
  * (driver-side distance over k small centroids) and exact-cosine
  * re-rank only those lists — candidates ≈ nprobe/k of the corpus,
  * never a full scan.
  */
object IvfAnn {

  final case class Index(assigned: DataFrame, centroids: Array[Vector])

  /** Fit (and memoize) the IVF index: k-means over the embeddings.
    * Index construction is setup cost, not query cost — `Bench`'s
    * warm-up builds it before any timed run. */
  def build(s: SparkSession, d: String, k: Int = 16): Index =
    graft.sources.SessionCache.getOrElseUpdate(s, ("ivf", d, k)) {
      // cluster on L2-NORMALIZED vectors: the index serves COSINE
      // queries, and on the unit sphere euclidean² = 2 − 2·cos, so
      // euclidean k-means becomes cosine-consistent (spherical k-means
      // up to centroid renormalization). Clustering raw vectors would
      // partition by magnitude — a metric the re-rank never uses.
      val vecs = embeddings(s, d)
        .withColumn("nrm", SimilarityQueries.l2norm(col("embedding")))
        .withColumn("features", array_to_vector(
          when(col("nrm") > 0,
            transform(col("embedding"), x => x.cast("double") / col("nrm")))
            .otherwise(transform(col("embedding"), x => x.cast("double")))))
      val model = new KMeans()
        .setK(k).setSeed(42L).setMaxIter(20)
        .setFeaturesCol("features").setPredictionCol("cluster")
        .fit(vecs)
      // the inverted lists ARE the index — a materialized structure,
      // persisted like any ANN index (at 100 TB: written out partitioned
      // by `cluster` so each list is a co-located shard). Only the
      // columns consumers read (vec_id, embedding, cluster) are cached:
      // the label column rode along unread, inflating the session
      // cache (r11 review).
      val assigned = model.transform(vecs)
        .select(col("vec_id"), col("embedding"), col("cluster"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Index(assigned, model.clusterCenters)
    }

  /** The query vector fetched driver-side ONCE (one row — collecting
    * it IS the broadcast): (raw floats, L2 norm, normalized doubles).
    * A zero-norm query rejects loudly — it has no cosine
    * neighbourhood, and the old fallback routed centroid probing by
    * meaningless magnitude (r11 review). Shared by the IVF, PQ, and
    * IVF-PQ query paths, which previously re-scanned the embeddings
    * source a second time per query to rebuild this same row. */
  private[operators] def fetchQuery(
      s: SparkSession, d: String, queryVecId: Long)
      : (Array[Float], Double, Array[Double]) = {
    val qRows = embeddings(s, d)
      .filter(col("vec_id") === queryVecId)
      .select(col("embedding")).head(1)
    require(qRows.nonEmpty,
      s"query vector vec_id=$queryVecId not found in $d/embeddings")
    val raw = qRows(0).getAs[scala.collection.Seq[Float]](0).toArray
    val qn = math.sqrt(raw.map(x => x.toDouble * x).sum)
    require(qn > 0,
      s"query vector vec_id=$queryVecId has zero norm — no cosine " +
        "neighbourhood is defined for it")
    (raw, qn, raw.map(_.toDouble / qn))
  }

  /** The `nprobe` centroid ids nearest (squared euclidean in the
    * normalized space) to a normalized query — the driver-side routing
    * step shared with the IVF-PQ composite (PqAnn.topKIvfPq). */
  def nearestCentroids(
      centroids: Array[Vector], q: Array[Double], nprobe: Int): Array[Int] =
    centroids.zipWithIndex
      .map { case (c, i) =>
        val dist = c.toArray.zip(q).map { case (a, b) =>
          (a - b) * (a - b)
        }.sum
        (i, dist)
      }
      .sortBy(_._2).take(nprobe).map(_._1)

  /** Top-k neighbours of `queryVecId`, probing `nprobe` inverted
    * lists. */
  def topK(
      s: SparkSession, d: String, queryVecId: Long, k: Int,
      nprobe: Int = 2, nClusters: Int = 16): DataFrame = {
    val idx = build(s, d, nClusters)
    // centroids live in the normalized space (see build) — the probe
    // distance compares against the normalized query; the raw floats
    // become the literal query column (no second embeddings scan)
    val (qRaw, qn, q) = fetchQuery(s, d, queryVecId)
    val probes = nearestCentroids(idx.centroids, q, nprobe)
    val qvLit = array(qRaw.toIndexedSeq.map(lit(_)): _*)
    idx.assigned
      .filter(col("cluster").isin(probes.map(Integer.valueOf): _*)
        && col("vec_id") =!= queryVecId)
      // zero-norm corpus vectors (tolerated by the index build) have
      // no defined cosine — under Spark's default ANSI mode the
      // division would throw DIVIDE_BY_ZERO mid-query (r11 review:
      // the PQ twin guarded this, the IVF path did not)
      .withColumn("nrm", SimilarityQueries.l2norm(col("embedding")))
      .where(col("nrm") > 0)
      .select(
        col("vec_id"), col("cluster"),
        round(
          SimilarityQueries.dot(col("embedding"), qvLit)
            / (col("nrm") * lit(qn)),
          4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Declared query: IVF top-10 for the query vector (no oracle — the
    * k-means partition is engine-internal; IvfAnnSpec asserts probe
    * behavior and score exactness vs brute force). */
  val qAnnIvf: QDef = QDef.noOracle("q_ann_ivf") { (s, d) =>
    topK(s, d, queryVecId = 0L, k = 10)
  }

  val defs: Seq[QDef] = Seq(qAnnIvf)
}
