package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Cost-gated logical rewrite: a non-equi point-in-interval inner join
  * (`p >= lo AND p <= hi`, point from one side, bounds from the other)
  * becomes a bin-replicated EQUI join when BOTH sides are too large to
  * broadcast — the case where Spark's only native plan is a
  * broadcast-nested-loop (quadratic work, or an outright planning
  * failure once neither side fits in the driver).
  *
  * Rewrite (the [[graft.operators.RangeJoin]] algorithm, applied
  * automatically): the interval side generates one row per overlapped
  * bin of width W, the point side computes its single bin, the join
  * becomes `binP = binI AND <original condition>`, and a final Project
  * restores the original output. Each qualifying pair meets in exactly
  * one bin (the point's), so the rewrite is output-invisible —
  * property-tested against the naive join in BinnedRangeRuleSpec.
  *
  * Gates (ALL must hold):
  *   - `spark.graft.rangeJoin.binWidth` is set to a positive long
  *     (the bin width is a data-dependent tuning choice — near the
  *     typical interval span — so the rule is opt-in);
  *   - the condition has a point-interval conjunct pair on integral
  *     types and NO cross-side equality conjunct (an equality already
  *     gives the planner a hash join key);
  *   - both sides' stats exceed autoBroadcastJoinThreshold (if either
  *     side broadcasts, the nested-loop plan is already the right
  *     one).
  *
  * Register per session (`spark.experimental.extraOptimizations`) or
  * via `spark.sql.extensions=graft.GraftExtensions`.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.binWidth"

  private def width: Option[Long] =
    Option(SQLConf.get.getConfString(WidthConf, null))
      .flatMap(s => scala.util.Try(s.toLong).toOption).filter(_ > 0)

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Floor-division bin id, exact on longs for any sign. */
  private def bin(e: Expression, w: Long): Expression = {
    val el = asLong(e)
    IntegralDivide(Subtract(el, Pmod(el, Literal(w))), Literal(w))
  }

  /** Match `point ∈ [lo, hi]` out of the conjuncts: one left-side
    * point bounded below and above by right-side expressions (or the
    * mirror image). Returns (point, lo, hi, pointIsLeft). */
  private def pointInterval(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    // normalize every comparison to (smaller, larger)
    val le = conjuncts.collect {
      case LessThanOrEqual(a, b) => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
    }.filter { case (a, b) =>
      integral(a) && integral(b) &&
        side(a).isDefined && side(b).isDefined && side(a) != side(b)
    }
    // lower bound: lo <= p; upper bound: p <= hi — same p, p's side
    // opposite to the bounds' side
    le.flatMap { case (lo, p) =>
      le.collect {
        case (p2, hi) if p2.semanticEquals(p) &&
            side(lo) == side(hi) && side(p) != side(lo) =>
          (p, lo, hi, side(p).contains(true))
      }
    }.headOption
  }

  private def hasCrossEquality(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet) && a.references.nonEmpty &&
          b.references.nonEmpty) ||
        (b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet) && a.references.nonEmpty &&
          b.references.nonEmpty)
      case _ => false
    }

  private def tooBigToBroadcast(p: LogicalPlan): Boolean = {
    val t = SQLConf.get.autoBroadcastJoinThreshold
    t < 0 || p.stats.sizeInBytes > t
  }

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if tooBigToBroadcast(left) && tooBigToBroadcast(right) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasCrossEquality(conjuncts, left, right)) j
        else pointInterval(conjuncts, left, right) match {
          case None => j
          case Some((p, lo, hi, pointIsLeft)) =>
            val (pointSide, intervalSide) =
              if (pointIsLeft) (left, right) else (right, left)
            val pBin = Alias(bin(p, w), "__graft_bin_p")()
            val pointProj =
              Project(pointSide.output :+ pBin, pointSide)
            // Sequence is TimeZoneAwareExpression: without an explicit
            // zone the node stays unresolved and plan validation fails
            // (integral sequences never use it, but resolution checks
            // presence, not use)
            val gen = Explode(
              Sequence(bin(lo, w), bin(hi, w), None)
                .withTimeZone(SQLConf.get.sessionLocalTimeZone))
            val iBinAttrs =
              DataTypeUtils.toAttributes(gen.elementSchema)
            val intervalGen = Generate(gen, Nil, outer = false, None,
              iBinAttrs, intervalSide)
            val newCond = And(
              EqualTo(pBin.toAttribute, iBinAttrs.head), cond)
            val newJoin =
              if (pointIsLeft)
                Join(pointProj, intervalGen, Inner, Some(newCond), hint)
              else
                Join(intervalGen, pointProj, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
        }
    }
  }
}
