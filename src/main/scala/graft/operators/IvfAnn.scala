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
      // by `cluster` so each list is a co-located shard)
      val assigned = model.transform(vecs)
        .select(col("vec_id"), col("label"), col("embedding"),
          col("cluster"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Index(assigned, model.clusterCenters)
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
    // the query vector is one row — collecting it IS the broadcast
    val qRows = embeddings(s, d)
      .filter(col("vec_id") === queryVecId)
      .select(col("embedding")).head(1)
    require(qRows.nonEmpty,
      s"query vector vec_id=$queryVecId not found in $d/embeddings")
    val raw = qRows(0).getAs[scala.collection.Seq[Float]](0).map(_.toDouble)
    // centroids live in the normalized space (see build) — the probe
    // distance must compare against the normalized query
    val qn = math.sqrt(raw.map(x => x * x).sum)
    val q = if (qn > 0) raw.map(_ / qn) else raw
    val probes = nearestCentroids(idx.centroids, q.toArray, nprobe)
    val qv = embeddings(s, d).filter(col("vec_id") === queryVecId)
      .select(
        col("embedding").as("qv"),
        SimilarityQueries.l2norm(col("embedding")).as("qnrm"))
    idx.assigned
      .filter(col("cluster").isin(probes.map(Integer.valueOf): _*)
        && col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(
        col("vec_id"), col("cluster"),
        round(
          SimilarityQueries.dot(col("embedding"), col("qv"))
            / (SimilarityQueries.l2norm(col("embedding")) * col("qnrm")),
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
