package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Md5HexSlice, Md5HexSlices}

/** The fused digest-to-long expressions must be value-IDENTICAL to the
  * composed `conv(substring(md5(x), pos, len), 16, 10)` column form
  * they replaced across every query path (r14 optimization round) —
  * the oracle SQL still derives the same values through DuckDB's
  * md5/substr/from-hex chain, so any drift here fails the driver hash
  * gate. Covers: random binary inputs over all legal (pos, len)
  * geometry classes, the two 60-bit halves used by q_bootstrap_ci,
  * eval vs codegen agreement (collect exercises codegen; a literal
  * fold exercises eval), null propagation, and the arity guards. */
class Md5HexSlicesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private def reference(bytes: Array[Byte], pos: Int, len: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(pos - 1, pos - 1 + len), 16)
  }

  test("matches conv(substring(md5)) for random inputs and slices") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = rng.nextInt(40)
      val b = new Array[Byte](n)
      rng.nextBytes(b)
      (i, b)
    }
    val slices = Seq((1, 15), (16, 15), (1, 4), (5, 8), (18, 15),
      (32, 1), (1, 1), (29, 4))
    val df = rows.toDF("id", "b").select(
      col("id"),
      Md5HexSlices(col("b"), slices: _*).as("xs"),
      conv(substring(md5(col("b")), 1, 15), 16, 10)
        .cast("bigint").as("c0"),
      conv(substring(md5(col("b")), 16, 15), 16, 10)
        .cast("bigint").as("c1"))
    val got = df.collect()
    for (r <- got) {
      val id = r.getInt(0)
      val xs = r.getSeq[Long](1)
      val bytes = rows(id)._2
      slices.zipWithIndex.foreach { case ((p, l), i) =>
        assert(xs(i) === reference(bytes, p, l),
          s"slice ($p,$l) of input $id")
      }
      assert(xs(0) === r.getLong(2), "composed conv form, slice 1")
      assert(xs(1) === r.getLong(3), "composed conv form, slice 2")
    }
  }

  test("scalar Md5HexSlice matches the array form and the conv form") {
    val df = Seq("", "a", "hello world", "é世界")
      .toDF("s")
      .select(
        Md5HexSlice(col("s").cast("binary"), 1, 15).as("one"),
        Md5HexSlices(col("s").cast("binary"), (1, 15)).getItem(0)
          .as("arr"),
        conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("bigint").as("ref"))
    df.collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(2))
      assert(r.getLong(1) === r.getLong(2))
    }
  }

  test("null input propagates null; guards reject bad geometry") {
    val r = Seq((1, Option.empty[Array[Byte]]))
      .toDF("id", "b")
      .select(Md5HexSlice(col("b"), 1, 15).as("v"))
      .collect()(0)
    assert(r.isNullAt(0))
    intercept[IllegalArgumentException] {
      graft.functions.Md5HexSlice(
        org.apache.spark.sql.graft.ColumnBridge
          .expression(col("b")), 1, 16)
    }
    intercept[IllegalArgumentException] {
      graft.functions.Md5HexSlice(
        org.apache.spark.sql.graft.ColumnBridge
          .expression(col("b")), 19, 15)
    }
    intercept[IllegalArgumentException] {
      graft.functions.Md5HexSlices(
        org.apache.spark.sql.graft.ColumnBridge
          .expression(col("b")), Seq.empty)
    }
  }
}
