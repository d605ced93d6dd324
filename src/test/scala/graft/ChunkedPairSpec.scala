package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupQueries, SimilarityQueries}
import graft.sources.TableLoader

/** r15 optimization equivalence specs: the chunked cosine kernel and
  * the inverted-index Jaccard must return EXACTLY what the row-per-pair
  * join forms they replaced returned — same pairs, same doubles, same
  * order — on real fixture data (sf0.01: 500 vectors / 10 labels,
  * ~12 k within-label pairs; 500 docs / 100 blocks).
  */
class ChunkedPairSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.session

  /** The pre-r15 q_sim_cosine / q_dedup_embedding shape: label-blocked
    * row-per-pair self-join (kept in prod as cosinePairs for the
    * guard primitive; rebuilt here without the guard for the
    * threshold variant). */
  private def joinFormPairs(nrmPositive: Boolean): DataFrame = {
    val e0 = TableLoader.embeddings(spark, sfDir)
      .select(
        col("vec_id"), col("label"), col("embedding"),
        SimilarityQueries.l2norm(col("embedding")).as("nrm"))
    val e = if (nrmPositive) e0.where(col("nrm") > 0) else e0
    val a = e.select(
      col("vec_id").as("vec_a"), col("label"),
      col("embedding").as("va"), col("nrm").as("nrm_a"))
    val b = e.select(
      col("vec_id").as("vec_b"), col("label").as("label_b"),
      col("embedding").as("vb"), col("nrm").as("nrm_b"))
    a.join(b,
        col("label") === col("label_b") && col("vec_a") < col("vec_b"))
      .select(
        col("vec_a"), col("vec_b"),
        (SimilarityQueries.dot(col("va"), col("vb"))
          / (col("nrm_a") * col("nrm_b"))).as("raw_cos"))
  }

  test("q_sim_cosine top-50 is bit-identical to the join form's top-50") {
    val oldTop = joinFormPairs(nrmPositive = false)
      .select(col("vec_a"), col("vec_b"),
        round(col("raw_cos"), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
      .limit(50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val newTop = SparkEntry.queries("q_sim_cosine")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(newTop == oldTop,
      s"chunked top-50 diverged from the join form:\n" +
        s"old=$oldTop\nnew=$newTop")
  }

  test("chunked top-k candidate set contains every pair the cutoff " +
    "proof promises (k-th raw value minus 1e-4)") {
    val all = joinFormPairs(nrmPositive = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // per-label 50th-largest raw bound is the weakest the kernel may
    // apply (a chunk pair is a subset of its label block); globally
    // every pair above the GLOBAL 50th-largest raw - 1e-4 must survive
    val cut = all.map(_._3).sorted(Ordering[Double].reverse)
      .take(50).last - 1e-4
    val mustKeep = all.filter(_._3 >= cut)
      .map(t => (t._1, t._2)).toSet
    val kept = SimilarityQueries.cosineTopPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = mustKeep -- kept
    assert(missing.isEmpty,
      s"kernel pruned pairs inside the safety margin: $missing")
  }

  test("q_dedup_embedding threshold set is bit-identical to the join " +
    "form's") {
    val oldSet = joinFormPairs(nrmPositive = true)
      .filter(col("raw_cos") >= 0.3)
      .select(col("vec_a"), col("vec_b"),
        round(col("raw_cos"), 4).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val newSet = SparkEntry.queries("q_dedup_embedding")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(newSet == oldSet)
  }

  test("cosineTopPairs refuses oversized label blocks (quadratic guard)") {
    val e = intercept[Exception] {
      SimilarityQueries.cosineTopPairs(spark, sfDir, maxPairs = 1L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("q_dedup_embedding_lsh")),
      s"guard did not fire or lost its message: $e")
  }

  test("inverted-index Jaccard pairs are bit-identical to the blocked " +
    "all-pairs join form") {
    // the pre-r15 shape: all-pairs within (source, lang), sorted-merge
    // intersection over the cached shingle arrays
    val docs = DedupQueries.shingleSets(spark, sfDir)
      .join(
        TableLoader.documents(spark, sfDir)
          .select(col("doc_id"), col("source"), col("lang")),
        "doc_id")
      .select(col("doc_id"), col("source"), col("lang"), col("sh"))
    val a = docs.select(
      col("source"), col("lang"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(
      col("source").as("source_b"), col("lang").as("lang_b"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = graft.functions.VectorExpressions
      .sortedIntersectCount(col("sh_a"), col("sh_b"))
    val jac = inter.cast("double") /
      (size(col("sh_a")) + size(col("sh_b")) - inter)
    val oldPairs = a.join(
        b,
        col("source") === col("source_b")
          && col("lang") === col("lang_b")
          && col("doc_a") < col("doc_b"))
      .filter(jac >= 0.05)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val newPairs = DedupQueries.ngramJaccardPairs(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(newPairs == oldPairs,
      s"inverted-index pair set diverged: " +
        s"only-old=${oldPairs -- newPairs} only-new=${newPairs -- oldPairs}")
  }

  test("inverted-index guard refuses hot-shingle blocks " +
    "(candidate-volume budget)") {
    val e = intercept[Exception] {
      DedupQueries
        .ngramJaccardPairs(spark, sfDir, maxPairsPerBlock = 0L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("q_dedup_minhash")),
      s"guard did not fire or lost its message: $e")
  }
}
