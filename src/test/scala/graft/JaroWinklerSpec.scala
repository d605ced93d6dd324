package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler

/** The from-scratch Jaro–Winkler: literature reference pairs, edge
  * cases, symmetry, and eval-vs-codegen parity. Corpus-wide agreement
  * with DuckDB's independent implementation is enforced by the
  * q_fuzzy_jw_pairs oracle gate. */
class JaroWinklerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(a, b)

  test("literature reference pairs") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.961111) < 1e-6)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-6)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.813333) < 1e-6)
  }

  test("edge cases: equality, emptiness, no-match, boost threshold") {
    assert(jw("same", "same") == 1.0)
    // DuckDB convention: no characters -> no matches -> 0, even for
    // two empty strings (emptiness wins over equality)
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0 && jw("", "a") == 0.0)
    assert(jw("x", "y") == 0.0)
    // adjacent transposition outside the window of 2-char strings
    assert(jw("ab", "ba") == 0.0)
    // below the 0.7 boost threshold the prefix bonus must NOT apply:
    // jaro("ax","abcdx") = 0.5667 and shares a 1-char prefix
    assert(math.abs(jw("ax", "abcdx") - 0.5666666666666667) < 1e-12)
  }

  test("symmetry and range over random-ish strings") {
    val words = Seq("widget", "widgets", "wdget", "gadget", "bolt",
      "small widget", "smal widget", "a", "", "zz")
    for (a <- words; b <- words) {
      val x = jw(a, b)
      assert(x >= 0.0 && x <= 1.0)
      assert(x == jw(b, a), s"asymmetric on ($a, $b)")
      if (a == b && a.nonEmpty) assert(x == 1.0)
    }
  }

  test("interpreted eval equals the generated path") {
    import spark.implicits._
    val pairs = Seq(
      ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
      ("small widget", "smal widget"), ("cold bolt", "cold bolts"),
      ("", ""), ("x", "y"), (null, "a"), ("a", null))
    val df = pairs.toDF("a", "b")
    val viaCol = df.select(
      JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    val expected = pairs.map { case (a, b) =>
      if (a == null || b == null) null else jw(a, b)
    }
    assert(viaCol.toSeq == expected,
      s"codegen/eval divergence: ${viaCol.toSeq} vs $expected")
  }
}
