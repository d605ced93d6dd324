package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityQueries
import graft.sources.TableLoader

/** ANN (sign-LSH banded) behavior vs the brute-force baseline. */
class AnnSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  test("q_ann_lsh is deterministic and returns candidate top-k") {
    val r1 = SparkEntry.queries("q_ann_lsh")(spark, sfDir).collect().toSeq
    val r2 = SparkEntry.queries("q_ann_lsh")(spark, sfDir).collect().toSeq
    assert(r1 == r2, "ANN result must be reproducible (fixed-seed planes)")
    assert(r1.nonEmpty, "query vector's LSH buckets should not be empty")
  }

  test("ANN cosines agree with brute force for the same vectors") {
    val ann = SparkEntry.queries("q_ann_lsh")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    val exact = SparkEntry.queries("q_sim_query_topk")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    // every ANN candidate's cosine must equal the exact computation
    // (the LSH filter changes WHICH vectors are scored, never the score)
    ann.foreach { case (id, c) =>
      exact.get(id).foreach(e => assert(math.abs(e - c) < 1e-9))
    }
  }

  test("lshSignature buckets identical vectors together") {
    val planes = SimilarityQueries.hyperplanes(8, 64)
    val e = TableLoader.embeddings(spark, sfDir).limit(5)
      .withColumn("sig", SimilarityQueries.lshSignature(col("embedding"), planes))
    val sigs = e.select("sig").collect().map(_.getLong(0))
    val again = e.select("sig").collect().map(_.getLong(0))
    assert(sigs.toSeq == again.toSeq)
    assert(sigs.forall(s => s >= 0 && s < 256), "8-bit signatures")
  }

  test("embeddingNearDupPairs finds seeded near-dups, verifies exactly") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.fill(64)(rng.nextGaussian().toFloat)
    val base = vec()
    // a near-identical copy (tiny perturbation => cosine ~ 0.9999)
    val nearDup = base.map(x => x + 0.001f * rng.nextGaussian().toFloat)
    val rows = Seq((0L, base), (1L, nearDup)) ++
      (2L until 40L).map(i => (i, vec()))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = SimilarityQueries
      .embeddingNearDupPairs(df, threshold = 0.9)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos")))
    assert(pairs.exists { case (a, b, _) => a == 0L && b == 1L },
      s"seeded near-dup (0,1) not found: ${pairs.toSeq}")
    // precision is exact by construction: every reported cosine is the
    // true cosine and clears the threshold
    pairs.foreach { case (_, _, c) => assert(c >= 0.9 && c <= 1.0001) }
    // independent gaussian vectors in 64-dim are near-orthogonal: no
    // random pair should clear a 0.9 cosine bar
    assert(pairs.forall { case (a, b, _) => a == 0L && b == 1L },
      s"false positives survived exact verification: ${pairs.toSeq}")
    // deterministic across runs (fixed-seed planes)
    val again = SimilarityQueries
      .embeddingNearDupPairs(df, threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos")))
    assert(pairs.toSeq == again.toSeq)
  }

  test("BandedSignKeys interpreted eval matches the codegen path") {
    val dim = 64; val nBands = 10; val bits = 12
    val planes = SimilarityQueries.hyperplanes(nBands * bits, dim)
      .flatten.toArray
    val e = TableLoader.embeddings(spark, sfDir).limit(50)
    // codegen path: through a DataFrame projection
    val viaDf = e.select(
      col("vec_id"),
      graft.functions.VectorExpressions
        .bandedSignKeys(col("embedding"), planes, dim, nBands, bits)
        .as("keys"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    // interpreted path: nullSafeEval on the raw arrays
    val raw = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    raw.foreach { case (id, v) =>
      val expr = graft.functions.BandedSignKeys(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        planes, dim, nBands, bits)
      val keys = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(keys == viaDf(id), s"eval/codegen divergence for vec $id")
      assert(keys.forall(k => k >= 0 && k < (1L << bits)))
    }
  }

  test("annTopK retrieves a planted high-cosine neighbor at rank 1") {
    // the honest sign-LSH guarantee: HIGH-cosine neighbors survive the
    // banding (cos ~1 agrees on every plane). The fixture's organic
    // top-k sits at cos ~0.3 where no sub-linear index can prune and
    // keep recall - that regime belongs to brute-force qSimQueryTopk.
    import spark.implicits._
    val base = TableLoader.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val q = base.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding")
    // same direction + a small constant shift: cos > 0.99 but not 1.0
    val planted = q.map(x => x + 0.02f).toArray
    val corpus = base.unionByName(
      Seq((99999L, planted)).toDF("vec_id", "embedding"))
    val top = SimilarityQueries.annTopKFrom(corpus, 0L, 5).collect()
    assert(top.nonEmpty && top.head.getLong(0) == 99999L,
      s"planted cos~1 neighbor not first: ${top.map(_.getLong(0)).toSeq}")
  }

  test("exact cosine refuses oversized label blocks (quadratic guard)") {
    // with a 1-pair budget every fixture label block is oversized —
    // the guard must raise and point at the scalable LSH path
    val e = intercept[Exception] {
      SimilarityQueries.cosinePairs(spark, sfDir, maxPairs = 1L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("q_dedup_embedding_lsh")),
      s"guard did not fire or lost its message: $e")
    // and the default budget still returns the fixture pairs
    assert(SimilarityQueries.cosinePairs(spark, sfDir).count() >= 1)
  }
}
