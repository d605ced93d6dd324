package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a codegen'd expression — the
  * entity-resolution scorer Spark's function library lacks (it ships
  * only levenshtein/soundex). Implements the textbook convention
  * exactly as DuckDB's `jaro_winkler_similarity` does — verified
  * empirically across the reference pair set and pinned corpus-wide by
  * the q_fuzzy_jw_pairs oracle:
  *
  *   - Jaro: match window ⌊max(|a|,|b|)/2⌋−1, greedy first-unmatched
  *     matching, transpositions = half the out-of-order matches,
  *     j = (m/|a| + m/|b| + (m−t)/m)/3; zero matches → 0; equal
  *     strings → 1.
  *   - Winkler boost ONLY past the 0.7 threshold:
  *     jw = j > 0.7 ? j + ℓ·0.1·(1−j) : j, ℓ = common prefix ≤ 4.
  *
  * The codegen path is a static call into [[JaroWinkler.similarity]] —
  * the RuntimeMethods pattern — so the expression stays inside
  * whole-stage codegen spans instead of forcing an interpreted
  * fallback the way a UDF would. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "jaro_winkler expects (string, string), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static scorer shared by the interpreted and generated paths.
    *
    * Unit of comparison is the UTF-16 code unit (Java `charAt`) — for
    * ASCII and BMP text this matches engines that compare code points
    * (DuckDB included, verified by the corpus-wide oracle); strings
    * with surrogate pairs (emoji, rare CJK) would count a supplementary
    * character as two units. Entity-resolution keys are normalized
    * ASCII-ish names in practice; normalize first if they aren't. */
  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    // emptiness wins over equality: DuckDB scores ("", "") as 0.0
    // (no characters → no matches), and parity with it is the contract
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val w = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - w)
      val hi = math.min(l2, i + w + 1)
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(l1, l2))
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
