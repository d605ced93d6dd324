package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.DedupPipeline

/** Corpus-level dedup composition over a seeded fixture (exact dups +
  * a near-dup + independents). */
class DedupPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private val rng = new scala.util.Random(99)
  private val vocab = Seq(
    "zeta", "eta", "theta", "iota", "kappa", "lambdaw", "mu", "nu",
    "xi", "omicron", "pi", "rho", "sigma", "tau", "upsilon")

  private def randomDoc(n: Int): String =
    Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")

  private lazy val sfDir: String = {
    val dir = Files.createTempDirectory("graft_dedup_pipe").toString
    val base = randomDoc(60)
    val near = { val t = base.split(" "); t(30) = "psi"; t.mkString(" ") }
    val docs = Seq(
      (0L, base, "en", "src0"),
      (1L, base, "en", "src0"), // exact dup of 0
      (2L, near, "en", "src0")) ++ // near dup of 0/1
      (3L to 12L).map(i => (i, randomDoc(60), "en", "src0"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dropExactDuplicates keeps one survivor per md5 group") {
    val docs = graft.sources.TableLoader.documents(spark, sfDir)
    val out = DedupPipeline.dropExactDuplicates(docs)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(1L), "higher-id exact dup must drop")
    assert(ids.contains(0L) && ids.contains(2L))
    assert(out.count() == docs.count() - 1)
    assert(out.columns.toSeq == docs.columns.toSeq, "schema preserved")
  }

  test("dropNearDuplicates removes the near-dup and exact-dup losers") {
    val out = DedupPipeline.dropNearDuplicates(spark, sfDir)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(0L), "lowest id of the cluster survives")
    assert(!ids.contains(1L) && !ids.contains(2L),
      s"near/exact dup losers must drop, got $ids")
    assert((3L to 12L).forall(ids.contains), "independents survive")
  }
}
