package graft.functions

import org.apache.datasketches.frequencies.LongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Frequent-items (heavy-hitters) sketches — DataSketches' LongsSketch,
  * the Misra–Gries / SpaceSaving family — as Catalyst aggregates: the
  * fourth leg of the mergeable-sketch stack (HLL cardinality, CMS
  * frequency LOOKUP, KLL quantiles, Theta set ops). CMS answers "how
  * often does item x occur" but cannot ENUMERATE the hot items without
  * a candidate list; a frequent-items sketch tracks the candidates
  * itself in a fixed-size map with the deterministic guarantee
  * `est ≤ true ≤ est + maxError`, `maxError ≤ 3.5·N/maxMapSize` —
  * no coin flips, unlike HLL/KLL/Theta.
  *
  * Two regimes, both useful:
  *   - distinct(keys) ≤ 0.75·maxMapSize: no purge ever happens, every
  *     count is EXACT (lb = est = ub) — the sketch is a mergeable
  *     fixed-size exact counter, which is why [[graft.operators
  *     .SketchQueries.qFreqSketchTopk]] can sit under the DuckDB hash
  *     gate;
  *   - more keys than the map holds: counts go approximate with the
  *     bound above and NO_FALSE_NEGATIVES enumeration keeps every true
  *     heavy hitter (FreqSketchSpec pins this purge regime on seeded
  *     skewed data).
  *
  * At 100 TB: each partition folds into a ≤maxMapSize map, partials
  * merge associatively (counter-wise add + purge), and the blob can be
  * PERSISTED per day/shard and re-merged incrementally — heavy-hitter
  * tracking across snapshots without rescanning history.
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsSketch] {

  // LongsSketch rejects non-power-of-2 maps with a constructor throw on
  // the EXECUTOR; fail at plan construction with a readable message
  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"freq_sketch maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch expects bigint, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, row: InternalRow): LongsSketch = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: LongsSketch, b: LongsSketch): LongsSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: LongsSketch): Any = buf.toByteArray

  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqSketchAgg = copy(child = c.head)
}

/** Re-union of materialized frequent-items blobs (the per-shard →
  * global incremental path). Counter maps add; the merged error bound
  * is the sum of the inputs' offsets — ≤ 3.5·N_total/mapSize at the
  * EFFECTIVE map size, which is the LARGEST map among the inputs and
  * this aggregate's own `maxMapSize` floor: the accumulator ADOPTS the
  * widest sketch it sees (merging the smaller one into it) instead of
  * folding every input into a fixed-size buffer, so re-merging blobs
  * built at mapSize 1024 through a default-64 merge no longer silently
  * purges them down to 64 slots. The merge is lossless exactly when no
  * purge fires anywhere (every map stayed under 75% load — the
  * exact-count regime); once any input has purged, the deterministic
  * est ≤ true ≤ est+maxError bound is what survives, not exactness. */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsSketch] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"freq_merge maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_merge expects binary, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(maxMapSize)

  /** Merge preserving the WIDEST map: when the incoming sketch has a
    * larger capacity than the accumulator, the accumulator's (fewer,
    * already-folded) counters merge INTO the incoming sketch and it
    * becomes the new buffer — merging the other way would purge the
    * wide input down to the narrow buffer's size and silently widen
    * every bound the caller thought it had. LongsSketch.merge is
    * counter-wise add either way, so the result is order-independent
    * up to the deterministic purge rule. */
  private def adoptWidest(acc: LongsSketch, in: LongsSketch): LongsSketch =
    if (in.getMaximumMapCapacity > acc.getMaximumMapCapacity) {
      in.merge(acc)
      in
    } else {
      acc.merge(in)
      acc
    }

  override def update(buf: LongsSketch, row: InternalRow): LongsSketch = {
    val v = child.eval(row)
    if (v == null) buf
    else adoptWidest(buf,
      LongsSketch.getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]])))
  }

  override def merge(a: LongsSketch, b: LongsSketch): LongsSketch =
    adoptWidest(a, b)

  override def eval(buf: LongsSketch): Any = buf.toByteArray

  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqMergeAgg = copy(child = c.head)
}

/** Probe a frequent-items blob for one item:
  * `freq_estimate(sketch, item)` → struct(est, lb, ub). Probe-path
  * scalar (a few rows against a broadcast blob), not a scan-path
  * expression — CodegenFallback is fine, same reasoning as the CMS
  * estimator probe. */
case class FreqEstimate(sketch: Expression, item: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, item)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType == BinaryType && item.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "freq_estimate expects (binary, bigint), got " +
        s"${sketch.dataType.simpleString}, ${item.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))

  override def eval(input: InternalRow): Any = {
    val s = sketch.eval(input)
    val v = item.eval(input)
    if (s == null || v == null) null
    else {
      val sk = LongsSketch.getInstance(
        Memory.wrap(s.asInstanceOf[Array[Byte]]))
      val it = v.asInstanceOf[Long]
      new GenericInternalRow(Array[Any](
        sk.getEstimate(it), sk.getLowerBound(it), sk.getUpperBound(it)))
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqEstimate =
    copy(sketch = c(0), item = c(1))
}

object FreqSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form: build a frequent-items blob over a bigint column. */
  def sketch(v: Column, maxMapSize: Int = 64): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(v), maxMapSize)
        .toAggregateExpression())

  /** Column form: union materialized frequent-items blobs. */
  def merge(blob: Column, maxMapSize: Int = 64): Column =
    ColumnBridge.column(
      FreqMergeAgg(ColumnBridge.expression(blob), maxMapSize)
        .toAggregateExpression())

  /** Column form: probe a blob for `item` → struct(est, lb, ub). */
  def estimate(blob: Column, item: Column): Column =
    ColumnBridge.column(FreqEstimate(
      ColumnBridge.expression(blob), ColumnBridge.expression(item)))
}
