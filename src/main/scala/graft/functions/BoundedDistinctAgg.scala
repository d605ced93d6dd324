package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Distinct-set-up-to-a-cap as a bounded-state
  * [[TypedImperativeAggregate]]: collects the group's DISTINCT bigint
  * values until one more than `cap` has been seen, then stops growing;
  * `eval` returns the sorted distinct array when the group stayed
  * within the cap and NULL when it overflowed.
  *
  * This is the scale-safe fused form of the
  * `dropDuplicates → count → filter(n ≤ cap) → join-back` guard
  * pattern: one aggregate pass replaces two aggregate passes plus a
  * join, and — unlike `collect_set` — a hot group (a boilerplate gram
  * present in millions of documents) holds AT MOST cap+1 longs of
  * state at every stage, on every mapper, forever. Merge is a capped
  * set union (associative/commutative): if the true distinct count is
  * ≤ cap every partial holds a full subset and the union is exact; if
  * it exceeds cap some merge chain reaches cap+1 and the group
  * evaluates to NULL — exactly the drop the guard wants.
  *
  * Determinism: the emitted array is sorted ascending, so downstream
  * explodes/joins see a canonical order. */
case class BoundedDistinctAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashSet[java.lang.Long]] {

  require(cap > 0, s"distinct_upto requires cap > 0, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == LongType) TypeCheckSuccess
    else TypeCheckFailure(
      s"distinct_upto expects a bigint input, got " +
        child.dataType.simpleString)
  }

  override def createAggregationBuffer(): java.util.HashSet[java.lang.Long] =
    new java.util.HashSet[java.lang.Long](8)

  override def update(
      set: java.util.HashSet[java.lang.Long],
      row: InternalRow): java.util.HashSet[java.lang.Long] = {
    val v = child.eval(row)
    // cap+1 marks overflow; beyond that nothing new is ever added
    if (v != null && set.size <= cap)
      set.add(v.asInstanceOf[Long])
    set
  }

  override def merge(
      a: java.util.HashSet[java.lang.Long],
      b: java.util.HashSet[java.lang.Long])
      : java.util.HashSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext && a.size <= cap) a.add(it.next())
    a
  }

  override def eval(set: java.util.HashSet[java.lang.Long]): Any =
    if (set.size > cap) null
    else {
      val arr = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

  override def serialize(
      set: java.util.HashSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + set.size * 8)
    bb.putInt(set.size)
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.HashSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.HashSet[java.lang.Long](n * 2)
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object BoundedDistinctAgg {
  /** Column form: sorted distinct bigint array, or NULL when the group
    * has more than `cap` distinct values. */
  def apply(value: Column, cap: Int): Column =
    ColumnBridge.column(
      BoundedDistinctAgg(ColumnBridge.expression(value), cap)
        .toAggregateExpression())
}
