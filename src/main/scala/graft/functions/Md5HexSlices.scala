package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Shared digest-to-long core for [[Md5HexSlices]]: md5 the input
  * bytes ONCE, then read each requested hex-digit range straight off
  * the digest nibbles. Numerically identical to the composed column
  * form `conv(substring(md5(x), pos, len), 16, 10) cast bigint` for
  * every (pos, len) with len ≤ 15 — hex digit i (1-based) of the md5
  * string is nibble i−1 of the big-endian digest, and 15 hex digits
  * are at most 60 bits, so the value is positive and exact in a Long.
  *
  * Why it exists (r14 optimization round, guide §1.2 "per-task work"):
  * the composed form allocates the 32-char hex string, a substring,
  * and runs NumberConverter's generic radix loop per value — measured
  * 1.9 s of q_bootstrap_ci's 3.4 s at sf0.1 (2 convs × 13 digest rows
  * × 150 k orders), more than the md5 itself (0.85 s). The fused
  * expression digests once per row and does pure nibble arithmetic
  * per slice; q_bootstrap_ci dropped to ~1.7 s with it.
  */
object Md5HexSliceUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `ranges` = flattened (pos1based, len) pairs over the 32 hex
    * digits of md5(input). */
  def slices(input: Array[Byte], ranges: Array[Int]): Array[Long] = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(input)
    val out = new Array[Long](ranges.length / 2)
    var r = 0
    while (r < out.length) {
      val pos = ranges(2 * r) - 1
      val len = ranges(2 * r + 1)
      var v = 0L
      var i = pos
      val end = pos + len
      while (i < end) {
        val b = d(i >> 1) & 0xFF
        v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xF)
        i += 1
      }
      out(r) = v
      r += 1
    }
    out
  }

  /** Single-slice fast path (ADVICE r14): returns the long directly —
    * no per-row long[1] allocation on token-grain callers
    * ([[Md5HexSlice]]). Same nibble arithmetic as [[slices]]. */
  def slice(input: Array[Byte], pos1based: Int, len: Int): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(input)
    val pos = pos1based - 1
    var v = 0L
    var i = pos
    val end = pos + len
    while (i < end) {
      val b = d(i >> 1) & 0xFF
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xF)
      i += 1
    }
    v
  }
}

/** `md5_hex_slices(bin, (pos, len)*)` → array<bigint>: for each
  * (pos, len), the value of hex digits [pos, pos+len) of md5(bin) —
  * exactly `conv(substring(md5(bin), pos, len), 16, 10)` per slice,
  * with ONE digest and no hex-string/substring/radix-parse
  * allocation. See [[Md5HexSliceUtil]] for the equivalence argument
  * and the measured motivation. len ≤ 15 keeps every value positive
  * and exact in BIGINT on both engines (the established 60-bit md5
  * discipline of [[Md5Shingles]]). */
case class Md5HexSlices(child: Expression, ranges: Seq[(Int, Int)])
    extends UnaryExpression {

  require(ranges.nonEmpty, "at least one (pos, len) slice required")
  require(ranges.forall { case (p, l) =>
    p >= 1 && l >= 1 && l <= 15 && p + l - 1 <= 32
  }, s"slices must satisfy pos >= 1, 1 <= len <= 15, pos+len-1 <= 32 " +
    s"(got $ranges)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_hex_slices expects binary, got ${t.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  private lazy val flat: Array[Int] =
    ranges.flatMap { case (p, l) => Seq(p, l) }.toArray

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Md5HexSliceUtil.slices(input.asInstanceOf[Array[Byte]], flat))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin => {
      val rangesRef = ctx.addReferenceObj("ranges", flat, "int[]")
      s"""
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.Md5HexSliceUtil.slices($bin, $rangesRef));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Md5HexSlices {
  /** Column API: `md5HexSlices(bin, (1, 15), (16, 15))` — element i is
    * slice i's value. */
  def apply(bin: Column, ranges: (Int, Int)*): Column =
    ColumnBridge.column(
      Md5HexSlices(ColumnBridge.expression(bin), ranges))
}

/** Scalar sibling of [[Md5HexSlices]] for the single-slice case:
  * returns the LONG directly, skipping the per-row array wrapper (a
  * one-element GenericArrayData boxes its Long — measurable on
  * token-grain inputs like the simhash word hash). Same equivalence
  * contract: `conv(substring(md5(bin), pos, len), 16, 10)` exactly. */
case class Md5HexSlice(child: Expression, pos: Int, len: Int)
    extends UnaryExpression {

  require(pos >= 1 && len >= 1 && len <= 15 && pos + len - 1 <= 32,
    s"slice must satisfy pos >= 1, 1 <= len <= 15, pos+len-1 <= 32 " +
      s"(got ($pos, $len))")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_hex_slice expects binary, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5HexSliceUtil.slice(input.asInstanceOf[Array[Byte]], pos, len)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin => {
      s"""
         |${ev.value} =
         |  graft.functions.Md5HexSliceUtil.slice($bin, $pos, $len);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Md5HexSlice {
  def apply(bin: Column, pos: Int, len: Int): Column =
    ColumnBridge.column(
      Md5HexSlice(ColumnBridge.expression(bin), pos, len))
}
