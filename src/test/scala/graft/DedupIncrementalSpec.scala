package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.DedupPipeline
import graft.sources.TableLoader

/** Incremental batch-vs-corpus dedup: seeded batch with known exact
  * dups, near dups (vs corpus and in-batch), and novel docs. */
class DedupIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  private def corpusDocs(n: Int): Seq[(Long, String)] =
    TableLoader.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(n).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("incremental dedup drops corpus dups, keeps novel docs") {
    import spark.implicits._
    val base = corpusDocs(3)
    // mutate ~1 token in 40 → jaccard stays >> 0.5
    def nearOf(t: String): String = {
      val w = t.split(" ")
      w.zipWithIndex
        .map { case (x, i) => if (i % 40 == 39) "zzz" else x }
        .mkString(" ")
    }
    val novel = (1 to 60)
      .map(i => s"novelword$i unique${i * 7} token${i * 13}")
      .mkString(" ")
    val batch = Seq(
      (10001L, base(0)._2), // exact dup of corpus
      (10002L, nearOf(base(1)._2)), // near dup of corpus
      (10003L, novel), // novel — must survive
      (10004L, novel), // exact in-batch dup of 10003 — dropped
      (10005L, nearOf(novel)) // near in-batch dup of 10003 — dropped
    ).toDF("doc_id", "text")
    val out = DedupPipeline.dedupIncremental(spark, batch, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(10003L), s"survivors: $out")
  }

  test("guards: a sub-floor threshold and an 'h'-colliding batch " +
    "column both reject loudly; a column named h rides through") {
    import spark.implicits._
    val batch = Seq((30001L, "alpha beta gamma", 7))
      .toDF("doc_id", "text", "h")
    // a user column named plain "h" must SURVIVE (the md5 temp rides
    // under a reserved name now — r11 review: it was silently replaced
    // and the reselect then threw)
    val out = DedupPipeline.dedupIncremental(spark, batch, sfDir)
    assert(out.columns.toSeq == Seq("doc_id", "text", "h"))
    assert(out.select(col("h")).collect().map(_.getInt(0)).toSeq
      == Seq(7))
    val e = intercept[IllegalArgumentException] {
      DedupPipeline.dedupIncremental(spark, batch, sfDir,
        threshold = 0.3)
    }
    assert(e.getMessage.contains("0.5"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DedupPipeline.verifiedPairs(spark, sfDir, 0.4)
    }
    assert(e2.getMessage.contains("floor"), e2.getMessage)
  }

  test("a clean batch passes through untouched") {
    import spark.implicits._
    val batch = Seq(
      (20001L, (1 to 50).map(i => s"alpha$i beta${i * 3}").mkString(" ")),
      (20002L, (1 to 50).map(i => s"gamma$i delta${i * 5}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = DedupPipeline.dedupIncremental(spark, batch, sfDir)
    assert(out.count() == 2)
    // schema preserved (same columns as the input batch)
    assert(out.columns.toSeq == Seq("doc_id", "text"))
  }

  test("incremental agrees with full-corpus dedup on the union") {
    import spark.implicits._
    // a batch made ONLY of novel docs + one corpus near-dup: the docs
    // the incremental path keeps must be exactly the batch docs that a
    // full dedup of (corpus ∪ batch) would keep (batch ids are higher,
    // so the corpus always wins ties in both policies)
    val base = corpusDocs(2)
    def nearOf(t: String): String = {
      val w = t.split(" ")
      w.zipWithIndex
        .map { case (x, i) => if (i % 35 == 34) "qqq" else x }
        .mkString(" ")
    }
    val batch = Seq(
      (30001L, nearOf(base(0)._2)),
      (30002L, (1 to 55).map(i => s"eps$i zeta${i * 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val kept = DedupPipeline.dedupIncremental(spark, batch, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(30002L), s"survivors: $kept")
  }

  test("incremental substring audit flags span-level corpus overlap") {
    import spark.implicits._
    val donor = corpusDocs(30).map(_._2).maxBy(_.length)
    require(donor.length >= 160, "fixture doc long enough for a span")
    // 70 chars lifted from mid-corpus-doc at an odd offset, wrapped in
    // fresh text — doc-level signatures would likely miss this; the
    // span audit must not
    val span = donor.substring(81, 151)
    val fresh = (1 to 60)
      .map(i => s"freshword$i unique${i * 11} tok${i * 17}")
      .mkString(" ")
    val batch = Seq(
      (20001L, fresh.take(140) + " " + span + " " + fresh.drop(200)),
      (20002L, fresh) // no corpus overlap — must be absent
    ).toDF("doc_id", "text")
    val out = DedupPipeline.substringOverlapIncremental(spark, batch, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matched_grid"), r.getAs[Long]("n_corpus_docs")))
      .toMap
    assert(out.contains(20001L),
      s"borrowed 70-char span must surface, got $out")
    assert(out(20001L)._1 >= 1L && out(20001L)._2 >= 1L)
    assert(!out.contains(20002L), s"fresh doc wrongly flagged: $out")
  }
}
