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
}
