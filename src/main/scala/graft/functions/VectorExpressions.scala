package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for embedding arithmetic
  * (SURVEY.md §2.10 "custom Expression" row — the fused-cosine
  * optimization).
  *
  * `DotProduct` compiles to a tight Java loop over the two
  * `ArrayData`s inside whole-stage codegen — versus ~192 expression
  * nodes for an unrolled sum or interpreted per-element lambdas for
  * `aggregate(zip_with(...))`. Accumulation is strictly left-to-right
  * in index order, so results are bit-identical to the sequential folds
  * the DuckDB oracle computes (float → double per element first).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dotp expects array<float> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // elementsMayBeNull: ArrayData primitive getters silently read a
  // null element as 0 — a plausible wrong dot product (r11 review).
  // The check compiles in ONLY when the input type admits null
  // elements; parquet-sourced embeddings with containsNull=false pay
  // nothing.
  private lazy val leftNullable = left.dataType match {
    case ArrayType(_, n) => n; case _ => true
  }
  private lazy val rightNullable = right.dataType match {
    case ArrayType(_, n) => n; case _ => true
  }

  // Length mismatch raises instead of silently truncating: a 32-dim
  // query joined against 64-dim embeddings is a data bug that a
  // plausible-looking partial dot product would mask (and l2/cosine
  // inherit the mask). Matches zip_with-style strictness in spirit;
  // an error beats a null here because a mismatch is never valid data.
  // A NULL ELEMENT raises for the same reason: the getter would read
  // it as 0.0 and silently zero that term.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"dotp: dimension mismatch ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      if ((leftNullable && x.isNullAt(i)) ||
        (rightNullable && y.isNullAt(i)))
        throw new IllegalArgumentException(
          s"dotp: null element at index $i (a null embedding " +
            "component is never valid data)")
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val nullCheck =
        if (leftNullable || rightNullable)
          s"""
             |if (${if (leftNullable) s"$a.isNullAt($i)" else "false"} ||
             |    ${if (rightNullable) s"$b.isNullAt($i)" else "false"}) {
             |  throw new IllegalArgumentException(
             |    "dotp: null element at index " + $i);
             |}
           """.stripMargin
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dotp: dimension mismatch (" + $n + " vs " +
         |      $b.numElements() + ")");
         |}
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $sum += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two SORTED long arrays via a codegen'd
  * two-pointer merge — O(|a|+|b|) with no per-element boxing, replacing
  * `size(array_intersect(...))` (hash-set build per row) on the hot
  * pair-verification path of the dedup operators. Inputs MUST be
  * sorted ascending and duplicate-free (array_sort∘array_distinct). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  // null elements would read as 0 through getLong, violating the
  // sorted-ascending precondition (array_sort puts nulls LAST) and
  // silently mis-counting (r11 review) — raise instead; compiled in
  // only when the input type admits null elements
  private lazy val leftNullable = left.dataType match {
    case ArrayType(_, n) => n; case _ => true
  }
  private lazy val rightNullable = right.dataType match {
    case ArrayType(_, n) => n; case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      if ((leftNullable && x.isNullAt(i)) ||
        (rightNullable && y.isNullAt(j)))
        throw new IllegalArgumentException(
          "sorted_intersect_count: null element (inputs must be " +
            "sorted duplicate-free non-null long arrays)")
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val nullCheck =
        if (leftNullable || rightNullable)
          s"""
             |if (${if (leftNullable) s"$a.isNullAt($i)" else "false"} ||
             |    ${if (rightNullable) s"$b.isNullAt($j)" else "false"}) {
             |  throw new IllegalArgumentException(
             |    "sorted_intersect_count: null element");
             |}
           """.stripMargin
        else ""
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  $nullCheck
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Banded sign-random-projection keys in ONE fused loop: for each of
  * `nBands * bitsPerBand` hyperplanes (flattened row-major into a
  * constant double[]), compute sign(v · plane) and pack the bits into
  * per-band BIGINT keys, returned as array<bigint> of length nBands.
  *
  * Exists because composing this from per-plane Column expressions
  * (120 dot products + shifts + ORs as a Catalyst tree) measured ~15×
  * slower at sf0.1 — the fused loop is the difference between an LSH
  * signature pass being free and being the bottleneck of the near-dup
  * pipeline. The plane matrix rides codegen as a reference object, not
  * 120 array literals.
  */
case class BandedSignKeys(
    child: Expression,
    planes: Array[Double],
    dim: Int,
    nBands: Int,
    bitsPerBand: Int)
    extends UnaryExpression {

  require(nBands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 64,
    // Java long shifts mask the amount mod 64: bitsPerBand > 64 would
    // silently ALIAS high plane signs onto low key bits, collapsing
    // LSH buckets with no diagnostic (r11 review)
    s"bitsPerBand must be in 1..64 (got $bitsPerBand; a BIGINT band " +
      "key holds at most 64 sign bits)")
  require(planes.length == nBands * bitsPerBand * dim,
    s"plane matrix must be (nBands*bitsPerBand)x$dim row-major")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"banded_sign_keys expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Array fields get reference equals on a case class — two
  // expressions over content-equal plane matrices must still compare
  // equal or Catalyst loses subexpression elimination and
  // exchange-reuse across them (r11 review)
  override def equals(o: Any): Boolean = o match {
    case b: BandedSignKeys =>
      child == b.child && dim == b.dim && nBands == b.nBands &&
        bitsPerBand == b.bitsPerBand &&
        java.util.Arrays.equals(planes, b.planes)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(dim),
      Integer.valueOf(nBands), Integer.valueOf(bitsPerBand),
      Integer.valueOf(java.util.Arrays.hashCode(planes)))

  private lazy val elemNullable = child.dataType match {
    case ArrayType(_, n) => n; case _ => true
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"banded_sign_keys: dimension mismatch (${v.numElements()} vs $dim)")
    // hoist the vector into a local: the plane loop re-reads every
    // element nBands*bitsPerBand times — one ArrayData virtual call
    // per element TOTAL instead of per plane (r11 review; this is the
    // hottest loop of the near-dup pipeline)
    val local = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (elemNullable && v.isNullAt(i))
        throw new IllegalArgumentException(
          s"banded_sign_keys: null element at index $i")
      local(i) = v.getFloat(i).toDouble
      i += 1
    }
    val out = new Array[Long](nBands)
    var p = 0
    while (p < nBands * bitsPerBand) {
      var s = 0.0
      val off = p * dim
      i = 0
      while (i < dim) { s += local(i) * planes(off + i); i += 1 }
      if (s > 0) out(p / bitsPerBand) |= 1L << (p % bitsPerBand)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("bands")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val local = ctx.freshName("vec")
      val nullCheck =
        if (elemNullable)
          s"""
             |if ($v.isNullAt($i)) {
             |  throw new IllegalArgumentException(
             |    "banded_sign_keys: null element at index " + $i);
             |}
           """.stripMargin
        else ""
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "banded_sign_keys: dimension mismatch (" + $v.numElements()
         |      + " vs " + $dim + ")");
         |}
         |double[] $local = new double[$dim];
         |for (int $i = 0; $i < $dim; $i++) {
         |  $nullCheck
         |  $local[$i] = (double) $v.getFloat($i);
         |}
         |long[] $out = new long[$nBands];
         |for (int $p = 0; $p < ${nBands * bitsPerBand}; $p++) {
         |  double $s = 0.0;
         |  int $off = $p * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $s += $local[$i] * $planesRef[$off + $i];
         |  }
         |  if ($s > 0) { $out[$p / $bitsPerBand] |= 1L << ($p % $bitsPerBand); }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Distinct hashed word k-shingles in ONE fused loop: from a doc's
  * token array, hash each token once (xxhash64 of its bytes), derive
  * every k-gram hash by chaining `XXH64.hashLong` over the window's
  * token hashes (exactly how Spark's multi-argument `xxhash64(a,b,c)`
  * chains its children), then sort + deduplicate in place. Output is a
  * SORTED DISTINCT array<bigint> — directly consumable by
  * SortedIntersectCount (pair verification) and MinHashSignature
  * (signature derivation).
  *
  * Replaces the composed
  * `array_distinct(transform(sequence(...), concat_ws(...)))` +
  * `transform(sh, xxhash64)` pipeline: higher-order-function lambdas
  * evaluate interpreted (per-element expression eval, no codegen), and
  * the composed form also materialized every shingle STRING (~20 bytes
  * each; ~1M per sf0.1 pass) just to hash it — the dominant cost AND
  * the dominant allocation of the whole dedup family whenever the
  * shingle cache is cold. Distinctness of hashed k-grams equals
  * distinctness of the string k-grams w.h.p. (64-bit hash, space-joined
  * tokens are injective for space-split input), so Jaccard values are
  * unchanged.
  */
case class HashedShingles(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashedShingleUtil.shingles(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.HashedShingleUtil.shingles($toks, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Row-at-a-time worker behind [[HashedShingles]], shared by the
  * interpreted eval and the generated code — the same one-static-call
  * pattern [[Md5ShingleUtil]] uses, so the algorithm exists ONCE (the
  * r11 review found it triplicated: eval, codegen, and the md5 twin
  * each carried a hand-synced copy of the sort/dedup tail). A null
  * token hashes to the sentinel 0L (distinct from xxh64("") w.h.p.) —
  * documented here because the md5 twin REJECTS nulls instead (its
  * oracle identity claim cannot survive them). */
object HashedShingleUtil {
  def shingles(toks: ArrayData, k: Int): Array[Long] = {
    val n = toks.numElements()
    if (n < k) return Array.emptyLongArray
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (toks.isNullAt(i)) 0L
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(toks.getUTF8String(i), 42L)
      i += 1
    }
    val m = n - k + 1
    val sh = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < k) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(th(i + j), h)
        j += 1
      }
      sh(i) = h
      i += 1
    }
    java.util.Arrays.sort(sh)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || sh(i) != sh(w - 1)) { sh(w) = sh(i); w += 1 }
      i += 1
    }
    if (w == m) sh else java.util.Arrays.copyOf(sh, w)
  }
}

/** Row-at-a-time worker behind [[Md5Shingles]], shared verbatim by the
  * interpreted eval and the generated code (one static call per ROW —
  * the per-element loop stays inside, so codegen pays no virtual
  * dispatch per shingle). Kept outside the expression because
  * generated classes cannot call methods on a Scala case class
  * reference without reflection. */
object Md5ShingleUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val SPACE = Array[Byte](' ')

  /** Sorted distinct 60-bit md5-prefix hashes of the space-joined
    * k-grams of `toks` — numerically identical to
    * `conv(substring(md5(gram), 1, 15), 16, 10)` per gram (the first
    * 15 hex chars are the top 60 bits of the big-endian digest
    * prefix), which is what lets a DuckDB oracle recompute the exact
    * same sets via `CAST(('0x' || substr(md5(gram), 1, 15)) AS
    * BIGINT)`. A NULL token raises: the concat_ws form this claims
    * numeric identity with SKIPS nulls while a silent empty-bytes
    * substitute would keep the separator (md5("a  b") ≠ md5("a b") —
    * r11 review), so the identity claim only survives by rejecting
    * the case loudly (split() tokenizations never produce null
    * tokens). */
  def shingles(toks: ArrayData, k: Int): Array[Long] = {
    val n = toks.numElements()
    if (n < k) return Array.emptyLongArray
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i))
        throw new IllegalArgumentException(
          s"md5_shingles: null token at index $i (the oracle's " +
            "concat_ws twin skips nulls — drop or fill nulls before " +
            "shingling)")
      tb(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val m = n - k + 1
    val sh = new Array[Long](m)
    val digest = md.get()
    i = 0
    while (i < m) {
      digest.reset()
      var j = 0
      while (j < k) {
        if (j > 0) digest.update(SPACE)
        digest.update(tb(i + j))
        j += 1
      }
      val d = digest.digest()
      var v64 = 0L
      j = 0
      while (j < 8) {
        v64 = (v64 << 8) | (d(j) & 0xFFL)
        j += 1
      }
      sh(i) = v64 >>> 4 // top 60 bits = first 15 hex chars
      i += 1
    }
    java.util.Arrays.sort(sh)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || sh(i) != sh(w - 1)) { sh(w) = sh(i); w += 1 }
      i += 1
    }
    if (w == m) sh else java.util.Arrays.copyOf(sh, w)
  }
}

/** PORTABLE-hash twin of [[HashedShingles]]: distinct word k-shingles
  * hashed to the top 60 bits of md5 (first 15 hex chars — positive,
  * overflow-free in ANSI Long AND DuckDB BIGINT arithmetic). This is
  * the hash that puts the whole MinHash/LSH dedup path under a
  * cross-engine oracle (md5 is the one hash both engines share —
  * SURVEY §0 fact 4); the xxhash64 [[HashedShingles]] stays available
  * for hash-CPU-bound corpora where oracle portability doesn't matter
  * (md5 costs roughly 5× more per gram — at 100 TB that's a real
  * knob, swapped with one constructor call).
  *
  * Unlike the string-materializing composed form, grams are digested
  * directly from token bytes (one MessageDigest update chain per
  * gram) — no shingle strings are ever allocated.
  */
case class Md5Shingles(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_shingles expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Md5ShingleUtil.shingles(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.Md5ShingleUtil.shingles($toks, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** All MinHash signature lanes in ONE fused loop: for a doc's array of
  * shingle hashes (masked to 31 bits internally), compute min over
  * elements of `(h*a_j + b_j) mod p` for every lane j, returning
  * array<bigint> of length `coeffsA.length`. Replaces 32 interpreted
  * `array_min(transform(...))` lambdas per row (the same
  * expression-tree overhead BandedSignKeys eliminates for LSH planes).
  *
  * Arithmetic contract (matches the Column form it replaces, and the
  * ANSI-safety analysis in DedupQueries): inputs are masked to 31 bits
  * in the loop and coefficients are < 2^31, so h*a + b < 2^62 + 2^31 —
  * no Long overflow; p is the Mersenne prime 2^31-1.
  */
case class MinHashSignature(
    child: Expression,
    coeffsA: Array[Long],
    coeffsB: Array[Long],
    prime: Long)
    extends UnaryExpression {

  require(coeffsA.length == coeffsB.length && coeffsA.nonEmpty)
  // the overflow bound comes from PRIME, not the coefficients alone:
  // h < 2^31 and a < prime ≤ 2^31-1 keep h*a+b < 2^62 (r11 review —
  // the old guard checked a against prime+1 without bounding prime,
  // so a caller-supplied 33-bit prime silently wrapped Long negative).
  // a ≡ 0 (mod p) — including a == prime — is also rejected: that
  // lane would be the constant b_j, never a permutation.
  require(prime > 1 && prime <= 2147483647L,
    s"prime must be in (1, 2^31-1] (got $prime; the 62-bit product " +
      "bound of h*a+b needs a 31-bit modulus)")
  require(coeffsA.forall(a => a > 0 && a < prime) &&
    coeffsB.forall(b => b >= 0 && b < prime),
    "coefficients must lie in [1, prime) / [0, prime) (a ≡ 0 mod p " +
      "is a constant lane; larger values overflow the 62-bit bound)")

  // structural equality over the Array fields (reference equals would
  // defeat Catalyst subexpression elimination across content-equal
  // coefficient sets; r11 review)
  override def equals(o: Any): Boolean = o match {
    case m: MinHashSignature =>
      child == m.child && prime == m.prime &&
        java.util.Arrays.equals(coeffsA, m.coeffsA) &&
        java.util.Arrays.equals(coeffsB, m.coeffsB)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Long.valueOf(prime),
      Integer.valueOf(java.util.Arrays.hashCode(coeffsA)),
      Integer.valueOf(java.util.Arrays.hashCode(coeffsB)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = Array.fill(coeffsA.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i) & 0x7FFFFFFFL
      var j = 0
      while (j < out.length) {
        val v = (h * coeffsA(j) + coeffsB(j)) % prime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coeffsA", coeffsA, "long[]")
    val bRef = ctx.addReferenceObj("coeffsB", coeffsB, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val out = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[${coeffsA.length}];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $hs.numElements(); $i++) {
         |  long $h = $hs.getLong($i) & 0x7FFFFFFFL;
         |  for (int $j = 0; $j < ${coeffsA.length}; $j++) {
         |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
         |    if ($v < $out[$j]) { $out[$j] = $v; }
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VectorExpressions {
  /** Column form: dot product of two float-array columns as double. */
  def dotp(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm via the fused dot product. */
  def l2(a: Column): Column = sqrt(dotp(a, a))

  /** |a ∩ b| for sorted duplicate-free long-array columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sorted distinct hashed word k-shingles (array<bigint>) from a
    * token array column. */
  def hashedShingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(tokens), k))

  /** Portable-hash twin: sorted distinct 60-bit md5-prefix k-shingles
    * (oracle-reproducible in DuckDB; see [[Md5Shingles]]). */
  def md5Shingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(Md5Shingles(ColumnBridge.expression(tokens), k))

  /** Fused MinHash lanes: min of (h*a_j+b_j) mod p per lane over a
    * hash array column, each hash masked to 31 bits in the loop
    * (Long.MaxValue lanes for empty arrays — callers filter empties). */
  def minhashSignature(
      hashes: Column, coeffs: Seq[(Long, Long)],
      prime: Long = 2147483647L): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(hashes),
      coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, prime))

  /** Per-band sign-LSH keys (array<bigint>, length nBands) for a
    * float-array column; `planes` is (nBands*bitsPerBand) x dim
    * row-major. */
  def bandedSignKeys(
      v: Column, planes: Array[Double], dim: Int, nBands: Int,
      bitsPerBand: Int): Column =
    ColumnBridge.column(BandedSignKeys(
      ColumnBridge.expression(v), planes, dim, nBands, bitsPerBand))
}
