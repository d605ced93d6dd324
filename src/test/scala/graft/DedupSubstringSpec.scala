package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-span tests for q_dedup_substring: a copied 70-char span must
  * surface its doc pair at ANY alignment (the stride-grid guarantee:
  * spans ≥ subW + subS − 1 = 59 chars always contain a grid-aligned
  * probe gram), independents must not pair, and the boilerplate
  * frequency guard must suppress grams shared by too many docs. */
class DedupSubstringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private val rng = new scala.util.Random(11)
  private val vocab = Seq(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  private def randomDoc(n: Int): String =
    Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_substr").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def pairs(dir: String): Map[(Long, Long), Long] =
    SparkEntry.queries("q_dedup_substring")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("a_doc"), r.getAs[Long]("b_doc")) ->
        r.getAs[Long]("n_shared"))
      .toMap

  test("a 70-char span copied at an arbitrary offset surfaces the pair") {
    val base = randomDoc(60)
    // span lifted from an odd offset of doc 0 — deliberately NOT
    // aligned to either doc's stride grid
    val span = base.substring(87, 157)
    val borrower = randomDoc(25) + " " + span + " " + randomDoc(25)
    val dir = writeDocs(
      Seq(0L -> base, 1L -> borrower) ++
        (2L to 15L).map(i => i -> randomDoc(60)))
    val p = pairs(dir)
    assert(p.contains((0L, 1L)), s"seeded span pair missing from $p")
    // independents must not pair (40 verbatim chars from a 20-word
    // vocab is a ~20^7 coincidence)
    assert(!p.keys.exists { case (a, b) => a >= 2 && b >= 2 },
      s"false span pairs: $p")
  }

  test("exact duplicates share ~len/stride grid grams") {
    val base = randomDoc(60) // ~360 chars
    val dir = writeDocs(
      Seq(0L -> base, 1L -> base) ++
        (2L to 9L).map(i => i -> randomDoc(60)))
    val p = pairs(dir)
    assert(p.contains((0L, 1L)))
    val expected = (base.length - 40) / 20 + 1
    assert(p((0L, 1L)) == expected.toLong,
      s"exact dup should match every grid gram: got ${p((0L, 1L))}, " +
        s"expected $expected")
  }

  test("boilerplate grams shared by >50 docs are suppressed") {
    val boiler = randomDoc(12) // ~70 chars, spans multiple grid grams
    val docs = (0L to 54L).map { i =>
      i -> (boiler + " " + randomDoc(40))
    }
    val dir = writeDocs(docs)
    val p = pairs(dir)
    // without the guard every one of the C(55,2) = 1485 pairs would
    // match BOTH in-boiler grid grams (n_shared >= 2). With it, only
    // boundary grams straddling the boiler/tail seam can match — those
    // are genuine 40-char shared substrings between SMALL doc groups
    // (same first tail word), each contributing at most the one seam
    // gram — so the signature of a working guard is: no pair reaches
    // n_shared >= 2, and the pair count stays far below all-pairs.
    assert(!p.values.exists(_ >= 2L),
      s"in-boiler grid grams leaked past the frequency guard: $p")
    assert(p.size < 100, s"guard failed to prune the pair explosion: ${p.size}")
  }

  test("span coverage: exact dups fully covered, independents absent") {
    val base = randomDoc(60)
    val dir = writeDocs(
      Seq(0L -> base, 1L -> base) ++
        (2L to 9L).map(i => i -> randomDoc(60)))
    val cov = SparkEntry.queries("q_dedup_span_coverage")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grid"), r.getAs[Long]("n_dup"),
          r.getAs[Double]("dup_frac")))
      .toMap
    assert(cov.keySet == Set(0L, 1L),
      s"only the dup pair should report coverage: ${cov.keySet}")
    cov.values.foreach { case (nGrid, nDup, frac) =>
      assert(nGrid == nDup)
      assert(frac == 1.0)
    }
  }

  test("span coverage: a partial borrower reports a partial fraction") {
    val base = randomDoc(60)
    val span = base.substring(87, 157)
    val borrower = randomDoc(25) + " " + span + " " + randomDoc(25)
    val dir = writeDocs(
      Seq(0L -> base, 1L -> borrower) ++
        (2L to 9L).map(i => i -> randomDoc(60)))
    val cov = SparkEntry.queries("q_dedup_span_coverage")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_frac"))
      .toMap
    assert(cov.contains(0L) && cov.contains(1L))
    assert(cov(0L) > 0.0 && cov(0L) < 1.0,
      s"70 of ~360 chars shared should be a partial fraction: $cov")
  }

  test("span cut: the later exact copy is cut, the first copy survives") {
    val base = randomDoc(60)
    val dir = writeDocs(
      Seq(0L -> base, 1L -> base) ++
        (2L to 9L).map(i => i -> randomDoc(60)))
    val rows = SparkEntry.queries("q_dedup_span_cut")(spark, dir)
      .collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L),
      "only the higher-id copy is cut; first occurrence survives intact")
    val r = rows.head
    // every grid gram matches doc 0, so the merged cut interval is
    // [1, lastGrid + 40) and only the sub-stride tail survives
    val nGrid = (base.length - 40) / 20 + 1
    val lastGrid = 1 + 20 * (nGrid - 1)
    val expectedClean = base.substring(lastGrid + 39) // 0-based drop
    assert(r.getAs[String]("clean_text") == expectedClean)
    assert(r.getAs[Long]("clean_len") == expectedClean.length.toLong)
    assert(r.getAs[Long]("n_cut") == (lastGrid + 39).toLong)
  }

  test("span cut: a borrower loses only the borrowed span") {
    val base = randomDoc(60)
    val span = base.substring(87, 157)
    val prefix = randomDoc(25)
    val suffix = randomDoc(25)
    val borrower = prefix + " " + span + " " + suffix
    val dir = writeDocs(
      Seq(0L -> base, 1L -> borrower) ++
        (2L to 9L).map(i => i -> randomDoc(60)))
    val rows = SparkEntry.queries("q_dedup_span_cut")(spark, dir)
      .collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    val clean = rows.head.getAs[String]("clean_text")
    // cut intervals are grid grams fully inside the borrowed span, so
    // the prefix and suffix must survive verbatim
    assert(clean.startsWith(prefix))
    assert(clean.endsWith(suffix))
    val nCut = rows.head.getAs[Long]("n_cut")
    assert(nCut >= 40L && nCut <= 70L,
      s"cut must stay within the 70-char borrowed span, got $nCut")
  }

  test("documents shorter than the gram width are ignored, not an error") {
    val dir = writeDocs(Seq(
      0L -> "short text under forty chars",
      1L -> randomDoc(60)))
    assert(pairs(dir).isEmpty)
  }
}
