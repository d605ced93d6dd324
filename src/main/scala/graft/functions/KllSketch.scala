package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** KLL quantile sketches (Apache DataSketches) as Catalyst aggregates —
  * the third leg of the mergeable-sketch family next to HLL
  * (cardinality, q_hll_sketch_merge) and CMS (frequency, q_cms_freq):
  * fixed-size mergeable QUANTILE summaries.
  *
  * Why this exists when `percentile` and `approx_percentile` already
  * do: the exact percentile buffers every value per group, and Spark's
  * approx sketch never leaves the plan. A materialized KLL sketch is a
  * few KB, merges associatively with rank error preserved (~1.65% at
  * k=200), and can be PERSISTED per day/shard then re-merged
  * incrementally — how a 100 TB pipeline tracks latency/length/price
  * distributions across snapshots without ever rescanning history.
  *
  * [[KllSketchAgg]] builds a sketch from doubles; [[KllMergeAgg]]
  * unions previously materialized sketch blobs; [[KllQuantiles]] reads
  * quantiles out of a blob. KLL compaction flips random coins, so two
  * runs may emit different (but equally valid) blobs — keep sketch
  * outputs out of hash-checked queries (same rule as HLL).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch expects double, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(
      a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllSketchAgg = copy(child = c.head)
}

/** Lossless re-union of materialized KLL sketch blobs (the per-shard →
  * global incremental path). */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge expects binary, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) buf.merge(KllDoublesSketch.heapify(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(
      a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllMergeAgg = copy(child = c.head)
}

/** Read quantiles out of a KLL blob: `kll_quantiles(sketch, ps)` →
  * array of quantile values (inclusive rank semantics). NULL-safe:
  * NULL sketch or an empty sketch yields NULL. Probe-path scalar, not
  * a scan-path expression — CodegenFallback is fine (same reasoning as
  * q_cms_freq's estimator probe). */
case class KllQuantiles(sketch: Expression, probs: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, probs)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType == BinaryType &&
        (probs.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "kll_quantiles expects (binary, array<double>), got " +
        s"${sketch.dataType.simpleString}, ${probs.dataType.simpleString}")
  override def dataType: DataType = ArrayType(DoubleType, false)

  override def eval(input: InternalRow): Any = {
    val s = sketch.eval(input)
    val p = probs.eval(input)
    if (s == null || p == null) null
    else {
      val sk = KllDoublesSketch.heapify(
        Memory.wrap(s.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) null
      else {
        val ps = p.asInstanceOf[ArrayData].toDoubleArray()
        new GenericArrayData(ps.map(sk.getQuantile))
      }
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllQuantiles =
    copy(sketch = c(0), probs = c(1))
}

object KllSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form: build a KLL sketch blob over a double column. */
  def sketch(v: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(v), k).toAggregateExpression())

  /** Column form: union materialized sketch blobs. */
  def merge(blob: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(blob), k).toAggregateExpression())

  /** Column form: quantiles at `ps` from a sketch blob. */
  def quantiles(blob: Column, ps: Column): Column =
    ColumnBridge.column(KllQuantiles(
      ColumnBridge.expression(blob), ColumnBridge.expression(ps)))
}
