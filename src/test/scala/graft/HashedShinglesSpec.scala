package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashedShingles, Md5Shingles, VectorExpressions}

/** The fused HashedShingles expression must be a faithful (injective
  * w.h.p.) image of the string-shingle pipeline it replaced: same set
  * CARDINALITY per doc and same pairwise INTERSECTION cardinalities as
  * distinct string k-grams — those two quantities are all any Jaccard
  * consumer reads. Plus sortedness/distinctness of the output (the
  * SortedIntersectCount precondition), eval/codegen parity, and the
  * n < k edge. */
class HashedShinglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private val vocab = Seq(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel")

  private def stringShingles(toks: Seq[String], k: Int): Set[Seq[String]] =
    toks.sliding(k).filter(_.size == k).map(_.toSeq).toSet

  test("cardinality + pairwise intersections match distinct string " +
    "k-grams; output sorted distinct") {
    val rng = new scala.util.Random(11)
    // small vocab forces repeated trigrams, exercising the dedupe path
    val rows = (0L until 30L).map { i =>
      (i, Seq.fill(5 + rng.nextInt(60))(vocab(rng.nextInt(vocab.size))))
    }
    val out = rows.toDF("id", "l")
      .select(col("id"), VectorExpressions.hashedShingles(col("l"), 3).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val ref = rows.map { case (id, toks) => id -> stringShingles(toks, 3) }.toMap
    rows.foreach { case (id, _) =>
      val sh = out(id)
      assert(sh.toSeq == sh.toSeq.sorted && sh.distinct.length == sh.length,
        s"output not sorted-distinct for id=$id")
      assert(sh.length == ref(id).size,
        s"cardinality mismatch for id=$id: ${sh.length} vs ${ref(id).size}")
    }
    for (a <- 0L until 10L; b <- (a + 1) until 10L) {
      val hashInter = out(a).toSet.intersect(out(b).toSet).size
      val strInter = ref(a).intersect(ref(b)).size
      assert(hashInter == strInter,
        s"intersection mismatch for ($a,$b): $hashInter vs $strInter")
    }
  }

  test("Md5Shingles equals the portable composed form " +
    "conv(substr(md5(gram),1,15),16,10) — the DuckDB oracle contract") {
    val rng = new scala.util.Random(23)
    val rows = (0L until 25L).map { i =>
      (i, Seq.fill(3 + rng.nextInt(40))(vocab(rng.nextInt(vocab.size))))
    }
    val out = rows.toDF("id", "l")
      .select(col("id"), VectorExpressions.md5Shingles(col("l"), 3).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
      .toMap
    val digest = java.security.MessageDigest.getInstance("MD5")
    def md5Prefix60(s: String): Long = {
      digest.reset()
      val d = digest.digest(s.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    rows.foreach { case (id, toks) =>
      val expected = toks.sliding(3).filter(_.size == 3)
        .map(g => md5Prefix60(g.mkString(" ")))
        .toSeq.distinct.sorted
      assert(out(id) == expected, s"md5 shingle mismatch for id=$id")
    }
    // eval/codegen parity + n < k edge for the md5 variant
    val lit3 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq("alpha", "bravo"), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))
    assert(Md5Shingles(lit3, 3).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 0)
  }

  test("eval (interpreted) matches the codegen path and handles n < k") {
    val toks = Seq("alpha", "bravo", "charlie", "alpha", "bravo", "charlie")
    val viaDf = Seq((1L, toks)).toDF("id", "l")
      .select(VectorExpressions.hashedShingles(col("l"), 3))
      .collect()(0).getSeq[Long](0).toSeq
    val viaEval = HashedShingles(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        toks, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), 3)
      .eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(viaDf == viaEval)
    // 6 tokens, window 3, one repeated trigram pattern -> 4 windows but
    // ("alpha","bravo","charlie") appears twice => 3 distinct
    assert(viaDf.length == 3)
    val short = HashedShingles(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("alpha", "bravo"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), 3)
      .eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(short.numElements() == 0)
  }
}
