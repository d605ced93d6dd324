package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BandedSignKeys, MinHashSignature, VectorExpressions}
import org.apache.spark.sql.graft.ColumnBridge

/** Strictness and equality contracts of the custom vector expressions
  * (r11 review): null ELEMENTS raise instead of silently reading as 0
  * through the primitive ArrayData getters; constructor guards bound
  * bitsPerBand and the minhash modulus; Array-field expressions
  * compare structurally so Catalyst subexpression elimination works
  * across content-equal constants. */
class VectorStrictnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  test("dotp raises on a null element instead of zeroing the term") {
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)) AS b")
    val e = intercept[Exception] {
      df.select(VectorExpressions.dotp(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("null element") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("null element"), e.getMessage)
    // non-null path unchanged
    val ok = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS a, " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)) AS b")
      .select(VectorExpressions.dotp(col("a"), col("b")).as("d"))
      .collect().head.getDouble(0)
    assert(ok == 8.0)
  }

  test("sorted_intersect_count raises on a null element (array_sort " +
    "puts nulls last, where getLong would read 0 and mis-merge)") {
    val df = spark.sql(
      "SELECT array(1L, 2L, CAST(NULL AS BIGINT)) AS a, " +
        "array(1L, 2L, 3L) AS b")
    val e = intercept[Exception] {
      df.select(VectorExpressions.sortedIntersectCount(col("a"), col("b")))
        .collect()
    }
    assert(e.getMessage.contains("null element") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("null element"), e.getMessage)
  }

  test("banded_sign_keys raises on a null element; bitsPerBand > 64 " +
    "rejects at construction (long shifts alias mod 64)") {
    val planes = Array.fill(2 * 2 * 3)(1.0)
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT), " +
        "CAST(1.0 AS FLOAT)) AS v")
    val e = intercept[Exception] {
      df.select(VectorExpressions.bandedSignKeys(col("v"), planes, 3, 2, 2))
        .collect()
    }
    assert(e.getMessage.contains("null element") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("null element"), e.getMessage)
    val g = intercept[IllegalArgumentException] {
      BandedSignKeys(ColumnBridge.expression(lit(1)), Array.fill(1 * 65 * 1)(1.0), 1, 1, 65)
    }
    assert(g.getMessage.contains("1..64"), g.getMessage)
  }

  test("banded_sign_keys hoisted-local path matches the composed " +
    "sign computation (values unchanged by the r11 optimization)") {
    val rng = new scala.util.Random(7)
    val dim = 5
    val planes = Array.fill(2 * 3 * dim)(rng.nextGaussian())
    val vec = Seq.fill(dim)(rng.nextGaussian().toFloat)
    val df = Seq(Tuple1(vec)).toDF("v")
      .select(col("v").cast("array<float>").as("v"))
    val got = df
      .select(VectorExpressions.bandedSignKeys(col("v"), planes, dim, 2, 3))
      .collect().head.getSeq[Long](0)
    val want = (0 until 2).map { band =>
      (0 until 3).foldLeft(0L) { (acc, bit) =>
        val p = band * 3 + bit
        val s = (0 until dim)
          .map(i => vec(i).toDouble * planes(p * dim + i)).sum
        if (s > 0) acc | (1L << bit) else acc
      }
    }
    assert(got == want, s"got $got want $want")
  }

  test("minhash guards: prime above 2^31-1 and a == prime both " +
    "reject at construction") {
    val child = ColumnBridge.expression(lit(1))
    val p = intercept[IllegalArgumentException] {
      MinHashSignature(child, Array(3L), Array(1L), 4294967311L)
    }
    assert(p.getMessage.contains("2^31-1"), p.getMessage)
    val a = intercept[IllegalArgumentException] {
      MinHashSignature(child, Array(2147483647L), Array(1L), 2147483647L)
    }
    assert(a.getMessage.contains("constant lane"), a.getMessage)
  }

  test("md5_shingles raises on a null token (the concat_ws oracle " +
    "twin skips nulls — silent empty-bytes would diverge); " +
    "hashed_shingles keeps its documented 0L sentinel") {
    val withNull = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b') AS toks")
    val e = intercept[Exception] {
      withNull.select(VectorExpressions.md5Shingles(col("toks"), 3))
        .collect()
    }
    assert(e.getMessage.contains("null token") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("null token"), e.getMessage)
    // xxhash twin still maps null -> sentinel (shape contract only)
    val hs = withNull
      .select(VectorExpressions.hashedShingles(col("toks"), 3).as("sh"))
      .collect().head.getSeq[Long](0)
    assert(hs.length == 1)
  }

  test("Array-field expressions compare STRUCTURALLY: content-equal " +
    "planes / coefficients from separate allocations are equal") {
    val c = ColumnBridge.expression(lit(1))
    val p1 = Array(1.0, -2.0, 3.0, -4.0)
    val p2 = Array(1.0, -2.0, 3.0, -4.0)
    assert(BandedSignKeys(c, p1, 2, 1, 2) == BandedSignKeys(c, p2, 2, 1, 2))
    assert(BandedSignKeys(c, p1, 2, 1, 2).hashCode ==
      BandedSignKeys(c, p2, 2, 1, 2).hashCode)
    assert(BandedSignKeys(c, p1, 2, 1, 2) !=
      BandedSignKeys(c, Array(1.0, -2.0, 3.0, 4.0), 2, 1, 2))
    val m1 = MinHashSignature(c, Array(3L, 5L), Array(1L, 2L), 2147483647L)
    val m2 = MinHashSignature(c, Array(3L, 5L), Array(1L, 2L), 2147483647L)
    assert(m1 == m2 && m1.hashCode == m2.hashCode)
    assert(m1 != MinHashSignature(c, Array(3L, 7L), Array(1L, 2L),
      2147483647L))
  }
}
