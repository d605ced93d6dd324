package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.DatasetBridge
import org.apache.spark.sql.types._

/** Native as-of join: for each left row, the single latest right row of
  * the same key whose time is `<=` the left row's time (optionally
  * within a tolerance) — the time-series point-lookup join (pandas
  * `merge_asof`, kdb `aj`) that Spark has no built-in operator for.
  *
  * This is the full custom-operator stack (SURVEY.md §2.3 `q_join_asof`
  * scale note): a [[LogicalPlan]] node, a planner [[SparkStrategy]],
  * and a physical [[AsOfJoinExec]] that merge-scans both sides inside
  * co-partitioned, co-sorted partitions.
  *
  * Why not the window formulation (still used by `q_join_asof`)? The
  * running-max window is correct and single-shuffle, but it must UNION
  * both event streams into one input first and carries the windowed
  * column through every row. The native operator keeps the sides
  * separate — each side is shuffled ONCE on its own key, sorted by
  * (key, time), and matched in a single forward pass with O(1) state
  * (one buffered right row per key) — the formulation that survives
  * two 100 TB inputs with no per-key state accumulation at all.
  *
  * Semantics:
  *   - at most one output row per left row (left-outer: unmatched left
  *     rows emit NULL right columns);
  *   - direction "backward" (default): the LATEST right row with
  *     rightTime <= leftTime; "forward": the EARLIEST right row with
  *     rightTime >= leftTime (the pandas merge_asof direction pair);
  *   - tie at equal right time: backward keeps the last row in
  *     (key, time) order, forward the first (callers needing
  *     determinism should project the matched time, which is unique,
  *     not an arbitrary payload column);
  *   - NULL left time or NULL right time never matches; NULL keys group
  *     together (GROUP BY semantics, same as the window formulation).
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    forward: Boolean)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length,
    "as-of join: key lists must have equal length")
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of join: key type mismatch ${l.dataType} vs ${r.dataType}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]. Injected by
  * [[graft.GraftExtensions]]; [[AsOfJoinOps.asof]] also self-registers
  * via `spark.experimental.extraStrategies` so the API works on plain
  * sessions.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, fwd,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: both children hash-partitioned on their keys
  * and sorted by (keys, time) — EnsureRequirements inserts the
  * exchanges and sorts from the declared requirements — then each
  * partition pair is merged in ONE forward pass. The only retained
  * state is the most recent candidate right row (`lastMatch`), so
  * memory is O(1) per partition regardless of key cardinality or skew.
  */
final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of matched left rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def sortOrder(keys: Seq[Expression], time: Expression) =
    (keys :+ time).map(SortOrder(_, Ascending))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(sortOrder(leftKeys, leftTime), sortOrder(rightKeys, rightTime))

  // the merge preserves the left child's (key, time) order
  override def outputOrdering: Seq[SortOrder] =
    sortOrder(leftKeys, leftTime)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val tol = toleranceMicros
    val fwd = forward
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val lTimeB = BindReferences.bindReference(lTime, lOut)
      val rTimeB = BindReferences.bindReference(rTime, rOut)
      // positional result projection: never resolves by exprId, so the
      // exec is correct even if an optimizer pass re-unifies exprIds
      // across the two sides of a self-join
      val resultProj = UnsafeProjection.create(
        outAttrs.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType,
            if (i < lOut.size) a.nullable else true)
        })
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      var lastMatch: InternalRow = null
      var lastKey: UnsafeRow = null
      var lastTime = 0L

      def micros(v: Any): Long = v match {
        case l: Long => l
        case i: Int => i.toLong
        case other => other.asInstanceOf[Number].longValue()
      }

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeV = lTimeB.eval(lRow)
        var matched = false
        var fwdMatch: InternalRow = null
        if (lTimeV != null) {
          val lT = micros(lTimeV)
          var scan = true
          while (scan && rBuf.hasNext) {
            val head = rBuf.head
            val cmp = keyOrd.compare(rKeyProj(head), lKey)
            if (cmp < 0) rBuf.next() // right behind left key: discard
            else if (cmp > 0) scan = false
            else {
              val rTimeV = rTimeB.eval(head)
              if (rTimeV == null) rBuf.next() // unmatchable, skip
              else {
                val rT = micros(rTimeV)
                if (fwd) {
                  // forward: discard rights strictly before lT (no
                  // later left can need them — lefts are ascending);
                  // the first right at/after lT is THE match, left
                  // unconsumed for equal-time later lefts
                  if (rT < lT) rBuf.next()
                  else {
                    if (tol.forall(t => rT - lT <= t)) {
                      matched = true
                      fwdMatch = head
                    }
                    scan = false
                  }
                } else if (rT <= lT) {
                  lastMatch = head.copy()
                  lastKey = lKey.copy()
                  lastTime = rT
                  rBuf.next()
                } else scan = false
              }
            }
          }
          if (!fwd) {
            matched = lastMatch != null &&
              keyOrd.compare(lastKey, lKey) == 0 &&
              tol.forall(t => lT - lastTime <= t)
          }
        }
        val rightRow =
          if (!matched) nullRight else if (fwd) fwdMatch else lastMatch
        numOutputRows += 1
        if (matched) numMatched += 1
        joined(lRow, rightRow)
        resultProj(joined)
      }
    }
  }
}

/** DataFrame-level API over the native operator. */
object AsOfJoinOps {

  /** `left ASOF JOIN right ON leftOn = rightOn AND right.timeCol <=
    * left.timeCol [AND within tolerance]`, latest match wins, left
    * outer. Right columns whose names collide with left columns are
    * suffixed `_r` (stable, and keeps self-joins free of ambiguous
    * attribute ids).
    */
  def asof(
      left: DataFrame,
      leftTimeCol: String,
      right: DataFrame,
      rightTimeCol: String,
      leftOn: Seq[String],
      rightOn: Seq[String],
      toleranceMicros: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(leftOn.length == rightOn.length,
      "asof: leftOn/rightOn must have equal length")
    require(direction == "backward" || direction == "forward",
      s"asof: direction must be backward or forward, got $direction")
    val spark = left.sparkSession
    DatasetBridge.addStrategy(spark, AsOfJoinStrategy)

    val taken = left.columns.toSet
    val renames = right.columns.map(c =>
      if (taken(c)) c -> (c + "_r") else c -> c).toMap
    val r2 =
      if (renames.forall { case (a, b) => a == b }) right
      else right.toDF(right.columns.map(renames): _*)

    val lPlan = DatasetBridge.analyzed(left)
    val rPlan = DatasetBridge.analyzed(r2)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof: no column '$name' on the $side side " +
            s"(have ${plan.output.map(_.name).mkString(", ")})"))
    val timeTypes: Set[DataType] =
      Set(TimestampType, TimestampNTZType, LongType, IntegerType, DateType)
    val lt = attr(lPlan, leftTimeCol, "left")
    val rt = attr(rPlan, renames.getOrElse(rightTimeCol, rightTimeCol),
      "right")
    Seq(lt, rt).foreach(a => require(timeTypes.contains(a.dataType),
      s"asof: time column ${a.name} must be timestamp/long/int/date, " +
        s"got ${a.dataType}"))

    DatasetBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      leftOn.map(attr(lPlan, _, "left")),
      rightOn.map(n => attr(rPlan, renames.getOrElse(n, n), "right")),
      lt, rt, toleranceMicros, direction == "forward"))
  }
}
