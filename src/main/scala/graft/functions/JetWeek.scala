package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Access/VBA week calendar under EVERY documented
  * `firstdayofweek` (0=vbUseSystem→Sunday, 1=vbSunday … 7=vbSaturday)
  * and `firstweekofyear` (0=vbUseSystem→vbFirstJan1, 1=vbFirstJan1,
  * 2=vbFirstFourDays, 3=vbFirstFullWeek) anchor — the r12 translator
  * accepted only the defaults and rejected the rest (SURVEY.md §2.7
  * date pack; r12 verdict "What's missing" #3).
  *
  * Semantics implemented (and pinned against an independent
  * java.time renderer in JetSqlFuzzSpec):
  *   - week 1 start for year Y:
  *       vbFirstJan1     — the fdow-week containing Jan 1;
  *       vbFirstFourDays — the first fdow-week with ≥4 days in Y
  *         (Jan 1's offset into its week ≤ 3), else the next week;
  *       vbFirstFullWeek — Jan 1 itself when it IS a week start,
  *         else the next week start.
  *   - ww(d) = floor((d − week1Start(year(d))) / 7) + 1 when d is on
  *     or after its own year's week 1; otherwise the count continues
  *     the PREVIOUS year's numbering (early-January days under
  *     anchors 2/3 return 52/53, as VB does and ISO 8601 agrees).
  *   - Late-December days are ALWAYS numbered within their own year —
  *     VB never rolls a Dec 29–31 date forward into next year's
  *     week 1 the way ISO 8601 does (the behavior Microsoft KB 200299
  *     documents for DatePart/Format "ww"). Matching Access means
  *     matching that: ww can return 53 where ISO says 1.
  *
  * Both expressions are single-splice by construction: the translator
  * emits ONE occurrence of the date argument, so a non-deterministic
  * argument (Now()) is evaluated exactly once (r13 ADVICE on the r12
  * DatePart("ww") emission, which spliced it twice).
  */
object JetWeek {

  /** vbUseSystem resolves to the US defaults the rest of the
    * translator already assumes (Sunday / week-with-Jan-1). */
  def resolveFdow(f: Int): Int = {
    if (f < 0 || f > 7) throw new IllegalArgumentException(
      s"jet_week: firstdayofweek $f outside 0..7")
    if (f == 0) 1 else f
  }

  private def resolveFwoy(w: Int): Int = {
    if (w < 0 || w > 3) throw new IllegalArgumentException(
      s"jet_week: firstweekofyear $w outside 0..3")
    if (w == 0) 1 else w
  }

  /** Access Weekday numbering of an epoch day: 1 = Sunday … 7 =
    * Saturday (epoch day 0 = 1970-01-01 = Thursday = 5). */
  private def dowSun1(epochDay: Long): Int =
    Math.floorMod(epochDay + 4, 7).toInt + 1

  /** Epoch day of the fdow-week start containing `epochDay`. */
  def weekStart(epochDay: Int, fdow0: Int): Int = {
    val fdow = resolveFdow(fdow0)
    epochDay - Math.floorMod(dowSun1(epochDay) - fdow, 7)
  }

  private def week1Start(year: Int, fdow: Int, fwoy: Int): Long = {
    val jan1 = java.time.LocalDate.of(year, 1, 1).toEpochDay
    val off = Math.floorMod(dowSun1(jan1) - fdow, 7)
    val ws = jan1 - off
    fwoy match {
      case 1 => ws
      case 2 => if (off <= 3) ws else ws + 7 // ≥4 days of Y in week
      case 3 => if (off == 0) jan1 else ws + 7
    }
  }

  /** DatePart("ww", d, fdow, fwoy) on an epoch day. */
  def weekNum(epochDay: Int, fdow0: Int, fwoy0: Int): Int = {
    val fdow = resolveFdow(fdow0)
    val fwoy = resolveFwoy(fwoy0)
    val year = java.time.LocalDate.ofEpochDay(epochDay.toLong).getYear
    val w1 = week1Start(year, fdow, fwoy)
    val anchor =
      if (epochDay >= w1) w1 else week1Start(year - 1, fdow, fwoy)
    ((epochDay - anchor) / 7).toInt + 1
  }
}

/** `jet_weeknum(date, fdow, fwoy)` → INT week-of-year under Access's
  * anchor arguments. Registered by GraftExtensions; the Jet-SQL
  * translator emits it for every DatePart("ww", …) so the date
  * expression is spliced exactly once. */
case class JetWeekNum(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DateType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"jet_weeknum expects (date, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(d: Any, f: Any, w: Any): Any =
    JetWeek.weekNum(d.asInstanceOf[Int], f.asInstanceOf[Int],
      w.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, f, w) =>
      s"${ev.value} = graft.functions.JetWeek.weekNum($d, $f, $w);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `jet_weekstart(date, fdow)` → DATE of the fdow-week start
  * containing the date. DateDiff("ww", a, b, fdow) is the whole-week
  * gap between the two week starts — each side spliced once. */
case class JetWeekStart(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DateType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"jet_weekstart expects (date, int), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = DateType

  override def nullSafeEval(d: Any, f: Any): Any =
    JetWeek.weekStart(d.asInstanceOf[Int], f.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, f) =>
      s"${ev.value} = graft.functions.JetWeek.weekStart($d, $f);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
