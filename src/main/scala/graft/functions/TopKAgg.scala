package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Top-k per group as a bounded-heap [[TypedImperativeAggregate]] —
  * the scale-first alternative to `row_number() ≤ k`:
  *
  * the window form SORTS every partition in full (WindowExec holds and
  * orders ALL of a group's rows to rank them), while this aggregate
  * keeps exactly k (score, id) pairs per group at every stage. With
  * map-side partial aggregation each mapper ships ≤ k rows per group
  * across the shuffle — for top-3-of-millions that is the difference
  * between shuffling the table and shuffling 3 rows per group per
  * mapper. `merge` folds two heaps (associative/commutative), so the
  * partial/final split is exact.
  *
  * Determinism: total order (score DESC, id ASC) at the heap boundary
  * AND in the emitted array — ties at the k-th place are decided, not
  * arbitrary. Output: array<struct<score double, id bigint>> sorted
  * strongest-first.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckSuccess
    else
      TypeCheckFailure(
        s"topk expects (double, bigint) inputs, got " +
          s"${score.dataType.simpleString} / ${id.dataType.simpleString}")
  }

  /** Weakest element at the root: smaller score first; equal scores →
    * LARGER id first (ties prefer the smaller id, so the larger id is
    * the weaker entry). */
  private def weakestFirst: java.util.Comparator[(Double, Long)] =
    new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }

  override def createAggregationBuffer()
      : java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, weakestFirst)

  private def offer(
      heap: java.util.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (heap.size < k) heap.offer(e)
    else if (weakestFirst.compare(e, heap.peek()) > 0) {
      heap.poll(); heap.offer(e)
    }
  }

  override def update(
      heap: java.util.PriorityQueue[(Double, Long)],
      row: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = score.eval(row)
    val i = id.eval(row)
    if (s != null && i != null)
      offer(heap, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    heap
  }

  override def merge(
      a: java.util.PriorityQueue[(Double, Long)],
      b: java.util.PriorityQueue[(Double, Long)])
      : java.util.PriorityQueue[(Double, Long)] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(
      heap: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = new Array[(Double, Long)](heap.size)
    var i = arr.length - 1
    val h = new java.util.PriorityQueue[(Double, Long)](heap)
    while (i >= 0) { arr(i) = h.poll(); i -= 1 } // strongest-first
    new GenericArrayData(arr.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id))
    })
  }

  override def serialize(
      heap: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + heap.size * 16)
    bb.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) {
      val (s, id) = it.next()
      bb.putDouble(s); bb.putLong(id)
    }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.offer((bb.getDouble, bb.getLong)); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

object TopKAgg {
  /** Column form: top-k (score, id) pairs per group, strongest first. */
  def apply(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(
        ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
