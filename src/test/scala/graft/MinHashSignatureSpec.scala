package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashSignature, VectorExpressions}

/** The fused MinHashSignature expression must agree exactly with the
  * composed Column form it replaced
  * (`array_min(transform(hs, h -> pmod(h*a+b, p)))` per lane) and with
  * a direct Scala computation, on random 31-bit hash sets — and its
  * interpreted eval must match its codegen output. */
class MinHashSignatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private val prime = 2147483647L
  private val coeffs: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(0xc0ffee)
    Seq.fill(16)(
      (rng.nextInt(Int.MaxValue).toLong | 1L,
        rng.nextInt(Int.MaxValue).toLong))
  }

  test("fused lanes == composed Column form == direct Scala, plus " +
    "eval/codegen parity") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 40).map { i =>
      (i.toLong,
        Seq.fill(1 + rng.nextInt(50))(rng.nextLong().abs & 0x7FFFFFFFL))
    }
    val df = rows.toDF("id", "hs")
    val fused = df.select(
      col("id"),
      VectorExpressions.minhashSignature(col("hs"), coeffs).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val composed = df.select(
      col("id"),
      array(coeffs.map { case (a, b) =>
        array_min(transform(col("hs"), h => pmod(h * a + b, lit(prime))))
      }: _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(fused == composed)
    rows.foreach { case (id, hs) =>
      val direct = coeffs.map { case (a, b) =>
        hs.map(h => (h * a + b) % prime).min
      }
      assert(fused(id) == direct, s"direct mismatch for id=$id")
      // interpreted eval (codegen path is what the DataFrame ran)
      val viaEval = MinHashSignature(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          hs, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)),
        coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, prime)
        .eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(viaEval == fused(id), s"eval/codegen divergence for id=$id")
    }
  }
}
