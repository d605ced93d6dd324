package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole winnowing fingerprint (SURVEY §2.9 text-analysis family) as
  * ONE per-row pass: hash every character `gram`-gram of the input
  * (md5 → first 8 hex digits, the cross-engine-stable derivation the
  * oracle mirrors), take the minimum of each `window`-hash sliding
  * window, and digest the sorted distinct minima.
  *
  * Replaces an explode → WindowExec(min) → groupBy(collect_set)
  * pipeline: that shape shuffles ~120 rows per document twice and
  * sorts them in the window — correct and scalable, but at sf0.1 it is
  * one of the slowest queries in the suite (~1.6 s) for work that is
  * strictly per-document over a BOUNDED prefix (128 chars). Bounded
  * per-row work belongs in a row expression; the fingerprint needs no
  * shuffle at all. Values are bit-identical: same md5-prefix hashes,
  * same full-window minima, same comma-joined sorted decimal digest.
  */
case class WinnowFingerprint(child: Expression, gram: Int, window: Int)
    extends UnaryExpression {

  require(gram >= 1 && window >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint expects string, got ${t.simpleString}")
  }

  // null for inputs too short to hold one full window of grams —
  // callers filter on length, this is the belt to that suspender
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", LongType, nullable = false),
    StructField("fp_digest", StringType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(
      input.asInstanceOf[UTF8String], gram, window)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // one static call per ROW (loops live in the helper): keeps the
      // surrounding operators inside whole-stage codegen without
      // inlining a digest implementation into generated Java
      s"""
         |${ev.value} = graft.functions.WinnowFingerprint.compute(
         |  $s, $gram, $window);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object WinnowFingerprint {
  private val md5 = ThreadLocal.withInitial(
    () => java.security.MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".toCharArray

  /** First 8 hex digits of md5(bytes) as an unsigned 32-bit long —
    * exactly `CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)`. */
  private def hash8(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    // first 4 digest bytes = first 8 hex chars
    ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
      ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
  }

  /** Null if fewer than `window` grams fit; otherwise the
    * (n_fp, fp_digest) struct. Called from eval AND generated code.
    * Gram positions count UTF-16 code units (String.substring); SQL
    * substr counts code points — identical for BMP text, which the
    * 128-char lowercased prefix of every fixture document is. */
  def compute(s: UTF8String, gram: Int, window: Int): InternalRow = {
    val str = s.toString
    val m = str.length - gram + 1
    if (m < window) return null
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = hash8(
        str.substring(i, i + gram).getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    // full windows only (positions window-1 .. m-1), matching the
    // exploded form's `i >= window` filter; O(m·w) is fine at w=4
    val minima = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j <= m - window) {
      var mn = hs(j)
      var k = 1
      while (k < window) {
        if (hs(j + k) < mn) mn = hs(j + k)
        k += 1
      }
      minima.add(mn)
      j += 1
    }
    val sb = new java.lang.StringBuilder()
    val it = minima.iterator()
    while (it.hasNext) {
      if (sb.length() > 0) sb.append(',')
      sb.append(it.next().longValue())
    }
    val d = md5.get()
    d.reset()
    val dig = d.digest(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var b = 0
    while (b < 16) {
      hex(b * 2) = HEX((dig(b) >> 4) & 0xF)
      hex(b * 2 + 1) = HEX(dig(b) & 0xF)
      b += 1
    }
    InternalRow(
      minima.size().toLong, UTF8String.fromString(new String(hex)))
  }

  /** Column form: struct<n_fp bigint, fp_digest string>. */
  def apply(text: Column, gram: Int, window: Int): Column =
    ColumnBridge.column(
      WinnowFingerprint(ColumnBridge.expression(text), gram, window))
}
