package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise exact-integer vector sum as a
  * [[TypedImperativeAggregate]] (the [[SimHashAgg]] pattern): for a
  * group of `array<bigint>` rows, returns
  * `struct(sums: array<bigint>, counts: array<bigint>)` where
  * `sums(i) = Σ row(i)` (nulls skipped, like SUM) and `counts(i)` is
  * how many rows HAD a dimension i, null or not (like COUNT(*) over
  * the posexplode rows) — so ragged AND nullable inputs keep exactly
  * the per-dimension statistics the posexplode + groupBy(pos) form
  * produced.
  *
  * Why it exists (r14 optimization round, guide §1.2): the exact
  * per-dimension corpus sums of q_embed_diversity were computed by
  * exploding every embedding to n·d rows and hash-aggregating them by
  * (label, pos) — ~200 ns per element of hash-probe work that
  * dominated the query at volume (13.4 s at the 10× probe; the
  * Decimal-vs-Long accumulation width was measured to be IRRELEVANT,
  * 13.44 → 13.12 s). This aggregate replaces the explode with a tight
  * per-row array loop: d additions per row, one buffer per group,
  * 2·d·8 bytes per group across the shuffle (partial/final split
  * works because element-wise addition is associative+commutative).
  * Groups are label-grain (bounded), so ObjectHashAggregateExec's
  * 128-group fallback is never hit (the documented constraint for
  * typed aggregates in this codebase).
  *
  * Exactness: identical integer additions in a different order —
  * Long addition is associative; per-dimension totals, and therefore
  * every downstream oracle-gated value, are bit-identical. Overflow
  * fails LOUDLY (Math.addExact in update/merge — ANSI discipline,
  * ADVICE r14); callers additionally bound |element|
  * (q_embed_diversity: ≤ 1e6 quantized units, so Long holds corpora
  * to ~9.2e12 rows per label). Nullable elements are rejected at
  * analysis time: the posexplode form COUNTS a null row, this
  * aggregate would have to skip it — the divergence is now a type
  * error instead of a comment.
  */
case class VectorSumAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorSumAgg.Buf] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    vec.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(
        s"vector_sum expects array<bigint>, got ${t.simpleString}")
    }
  }

  override def createAggregationBuffer(): VectorSumAgg.Buf =
    new VectorSumAgg.Buf(Array.emptyLongArray, Array.emptyLongArray)

  private def grown(buf: VectorSumAgg.Buf, d: Int): VectorSumAgg.Buf =
    if (buf.sums.length >= d) buf
    else new VectorSumAgg.Buf(
      java.util.Arrays.copyOf(buf.sums, d),
      java.util.Arrays.copyOf(buf.counts, d))

  override def update(
      buf: VectorSumAgg.Buf, row: InternalRow): VectorSumAgg.Buf = {
    val v = vec.eval(row)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = grown(buf, d)
    // fast path compiled per ArrayType.containsNull, like DotProduct:
    // parquet-clean inputs pay no per-element branch
    val mayBeNull = vec.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }
    var i = 0
    while (i < d) {
      // POSEXPLODE-EXACT null semantics (ADVICE r14): the form this
      // replaces emitted the null element row, where SUM skips it but
      // COUNT(*) counts it — so counts(i) increments unconditionally
      // and only sums(i) skips nulls. addExact makes overflow LOUD —
      // ANSI discipline, negligible next to the hash-aggregate this
      // replaced.
      if (!mayBeNull || !arr.isNullAt(i))
        b.sums(i) = Math.addExact(b.sums(i), arr.getLong(i))
      b.counts(i) += 1L
      i += 1
    }
    b
  }

  override def merge(
      a: VectorSumAgg.Buf, b: VectorSumAgg.Buf): VectorSumAgg.Buf = {
    val out = grown(a, b.sums.length)
    var i = 0
    while (i < b.sums.length) {
      out.sums(i) = Math.addExact(out.sums(i), b.sums(i))
      out.counts(i) += b.counts(i)
      i += 1
    }
    out
  }

  override def eval(buf: VectorSumAgg.Buf): Any =
    InternalRow(
      new GenericArrayData(buf.sums),
      new GenericArrayData(buf.counts))

  override def serialize(buf: VectorSumAgg.Buf): Array[Byte] = {
    val d = buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + d * 16)
    bb.putInt(d)
    buf.sums.foreach(bb.putLong)
    buf.counts.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSumAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    new VectorSumAgg.Buf(
      Array.fill(d)(bb.getLong), Array.fill(d)(bb.getLong))
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(vec = c(0))
}

object VectorSumAgg {
  /** Mutable aggregation state: element-wise sums + per-dimension row
    * counts, grown to the longest input seen. */
  final class Buf(var sums: Array[Long], var counts: Array[Long])

  /** Column form: element-wise sums/counts over array<bigint> rows. */
  def apply(vec: Column): Column =
    ColumnBridge.column(
      VectorSumAgg(ColumnBridge.expression(vec)).toAggregateExpression())
}
