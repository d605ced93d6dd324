package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Similarity search over the embedding column (SURVEY.md §2.9 +
  * driver mandate): brute-force cosine as the exact baseline, a
  * broadcast query-vector top-k, and an LSH-bucketed ANN variant as the
  * scale path.
  *
  * Scale design: the pairwise form never materializes O(n²) globally —
  * it blocks on `label` (at 100 TB: LSH band keys, see AnnLsh), and the
  * query-vector form broadcasts one row against the fleet. Dot products
  * ride `zip_with`+`aggregate` higher-order functions: sequential
  * 64-element folds, bit-identical across engines after FLOAT→DOUBLE.
  */
object SimilarityQueries {

  /** Shared DuckDB prelude: embeddings as DOUBLE lists with norms. */
  private val oracleNorms =
    """WITH e AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      |  FROM e)""".stripMargin

  /** Embedding dimension of the fixtures (64-element float lists). */
  val dim = 64

  /** cosine(a, b) over ArrayType(FloatType) columns, cast to double.
    *
    * The dot/norm folds are UNROLLED over the fixed dimension instead of
    * `aggregate(zip_with(...))`: higher-order functions run interpreted
    * per element, while the unrolled sum is one whole-stage-codegen
    * expression (~6x faster at bench). Summation stays strictly
    * left-to-right (i=1..64), so the result is bit-identical to the
    * sequential fold the DuckDB oracle computes. */
  /** Fused native dot product (graft.functions.DotProduct): a codegen'd
    * index loop, bit-identical to the oracle's sequential fold. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotp(a, b)

  def l2norm(a: Column): Column =
    graft.functions.VectorExpressions.l2(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Generic-dimension cosine via higher-order functions — kept as the
    * fallback for dynamic-width arrays (schema not known at plan time).
    */
  def cosineDynamic(a: Column, b: Column): Column = {
    val dot = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(
      a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(
      b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }

  /** Pair budget for the exact pairwise form: quadratic-within-block
    * operators refuse to run past this many candidate pairs per block
    * (the q_dedup_ngram_jaccard guard discipline) — the corpus-scale
    * formulations are qAnnLsh / qDedupEmbeddingLsh / IVF, never the
    * exact self-join. */
  val maxPairsPerLabel = 10000000L

  /** Label-blocked exact cosine pairs with the quadratic guard
    * (exposed with a settable budget for the guard spec). */
  def cosinePairs(
      s: SparkSession, d: String,
      maxPairs: Long = maxPairsPerLabel): DataFrame = {
    // norms are computed ONCE per vector before the join (norm work is
    // O(n), not O(pairs)); only the dot product runs per pair
    val e0 = embeddings(s, d)
      .select(
        col("vec_id"), col("label"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    // block-size guard: evaluated distributedly over the tiny
    // per-label aggregate (no driver collect); joining it back touches
    // every label once and fires the error before any pair is built
    // n(n-1)/2 > maxPairs ⇔ n > maxRows with maxRows PRECOMPUTED: the
    // product form overflows Long at n ≈ 4.3e9 — wrapping negative
    // (guard silently off) without ANSI, or dying with a raw
    // ArithmeticException instead of this diagnostic under ANSI —
    // which is exactly the scale the guard exists to protect
    val maxRows =
      ((1.0 + math.sqrt(1.0 + 8.0 * maxPairs.toDouble)) / 2.0).toLong
    val labelGuard = e0.groupBy(col("label"))
      .agg(count(lit(1)).as("__ln"))
      .select(
        col("label"),
        when(
          col("__ln") > maxRows,
          raise_error(concat(
            lit("q_sim_cosine: label block "), col("label"),
            lit(" has "), col("__ln"),
            lit(s" vectors — more than $maxPairs candidate " +
              "pairs; the exact pairwise form is a re-rank primitive, " +
              "use q_dedup_embedding_lsh / q_ann_lsh for corpus scale")))
            .cast("long"))
          .otherwise(col("__ln")).as("__ln"))
    val e = e0.join(broadcast(labelGuard), "label")
      .filter(col("__ln") > 0)
      .drop("__ln")
    val a = e.select(
      col("vec_id").as("vec_a"), col("label"),
      col("embedding").as("va"), col("nrm").as("nrm_a"))
    val b = e.select(
      col("vec_id").as("vec_b"), col("label").as("label_b"),
      col("embedding").as("vb"), col("nrm").as("nrm_b"))
    a.join(b, col("label") === col("label_b") && col("vec_a") < col("vec_b"))
      .select(
        col("vec_a"), col("vec_b"),
        round(dot(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")), 4)
          .as("cos"))
  }

  /** Target vectors per chunk for the chunked pair kernel: small
    * enough that a packed chunk row stays ~100 KB (collect_list of
    * ≤ chunkTarget 64-float structs), big enough that each kernel call
    * amortizes its unpack over ~chunkTarget²/2 fused-loop dot products.
    * Chunk COUNT per label is derived from the label's row count, so
    * the layout is scale-adaptive (guide §2.2), not tuned to local[32]. */
  private val chunkTarget = 256

  /** Chunked exact pair frame (optimization round 2, guide §8 /
    * CosineChunkKernel): group each label block into
    * ceil(n/chunkTarget) chunks keyed by pmod(vec_id), pack each chunk
    * once (collect_list), equi-join chunk pairs on label, and let the
    * kernel UDF emit the surviving pairs of each chunk pair. Replaces
    * the row-per-pair self-join that materialized two embedding arrays
    * per candidate pair (the 25×-at-10× growth driver of r14's probe).
    *
    * `perLabel` is the per-label guard/chunk-count aggregate: label →
    * __k (chunk count), with the caller's raise_error guard already
    * folded in. `kernel(ms_a, ms_b, same)` returns
    * array<struct<vec_a, vec_b, raw cosine>>. */
  private def chunkedPairs(
      e0: DataFrame, perLabel: DataFrame,
      kernel: (Column, Column, Column) => Column): DataFrame = {
    val chunked = e0.join(broadcast(perLabel), "label")
      .select(
        col("label"),
        pmod(col("vec_id"), col("__k")).as("ck"),
        struct(col("vec_id"), col("embedding"), col("nrm")).as("m"))
      .groupBy(col("label"), col("ck"))
      .agg(collect_list(col("m")).as("ms"))
    val a = chunked.select(
      col("label"), col("ck").as("ck_a"), col("ms").as("ms_a"))
    val b = chunked.select(
      col("label").as("label_b"), col("ck").as("ck_b"), col("ms").as("ms_b"))
    a.join(b,
        col("label") === col("label_b") && col("ck_a") <= col("ck_b"))
      .select(explode(
        kernel(col("ms_a"), col("ms_b"), col("ck_a") === col("ck_b")))
        .as("p"))
      .select(
        col("p._1").as("vec_a"), col("p._2").as("vec_b"),
        col("p._3").as("raw_cos"))
  }

  /** Per-label chunk counts with the quadratic guard folded in: any
    * label whose pair count exceeds `maxPairs` refuses distributedly
    * (same raise_error diagnostic as [[cosinePairs]]). */
  private def guardedChunkCounts(
      e0: DataFrame, maxPairs: Long): DataFrame = {
    val maxRows =
      ((1.0 + math.sqrt(1.0 + 8.0 * maxPairs.toDouble)) / 2.0).toLong
    e0.groupBy(col("label"))
      .agg(count(lit(1)).as("__ln"))
      .select(
        col("label"),
        when(
          col("__ln") > maxRows,
          raise_error(concat(
            lit("q_sim_cosine: label block "), col("label"),
            lit(" has "), col("__ln"),
            lit(s" vectors — more than $maxPairs candidate " +
              "pairs; the exact pairwise form is a re-rank primitive, " +
              "use q_dedup_embedding_lsh / q_ann_lsh for corpus scale")))
            .cast("long"))
          .otherwise(
            ceil(col("__ln").cast("double") / lit(chunkTarget.toDouble))
              .cast("long"))
          .as("__k"))
  }

  /** Candidate superset of the global top-k pairs by rounded cosine:
    * each chunk pair keeps its local top-k with the raw cutoff
    * L − 1e-4 (see CosineChunkKernel.topPairs for the proof that no
    * global rounded-top-k member can be pruned). Raw cosines — the
    * caller rounds/orders/limits. */
  def cosineTopPairs(
      s: SparkSession, d: String, k: Int = 50,
      maxPairs: Long = maxPairsPerLabel): DataFrame = {
    val e0 = embeddings(s, d)
      .select(
        col("vec_id"), col("label"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    val kernel = udf((a: Seq[org.apache.spark.sql.Row],
        b: Seq[org.apache.spark.sql.Row], same: Boolean) =>
      graft.functions.CosineChunkKernel.topPairs(a, b, same, k))
    chunkedPairs(e0, guardedChunkCounts(e0, maxPairs),
      (ma, mb, same) => kernel(ma, mb, same))
  }

  /** Exact threshold pair frame (cos ≥ t) through the same chunked
    * kernel — the scale form of the q_dedup_embedding join. The input
    * frame must already carry (vec_id, label, embedding, nrm). */
  def cosineThresholdPairs(e0: DataFrame, t: Double): DataFrame = {
    val perLabel = e0.groupBy(col("label"))
      .agg(count(lit(1)).as("__ln"))
      .select(
        col("label"),
        ceil(col("__ln").cast("double") / lit(chunkTarget.toDouble))
          .cast("long").as("__k"))
    val kernel = udf((a: Seq[org.apache.spark.sql.Row],
        b: Seq[org.apache.spark.sql.Row], same: Boolean) =>
      graft.functions.CosineChunkKernel.thresholdPairs(a, b, same, t))
    chunkedPairs(e0, perLabel, (ma, mb, same) => kernel(ma, mb, same))
  }

  /** Pairwise cosine within label blocks, global top-50 pairs.
    *
    * Quadratic WITHIN each label block, so guarded like the n-gram
    * twin: a distributed raise_error over the per-label count
    * aggregate refuses any block whose pair count exceeds
    * [[maxPairsPerLabel]], pointing at the banded-LSH twin — the exact
    * form is the re-rank primitive, not the scale path.
    *
    * r15 optimization: pairs come from the chunked kernel
    * ([[cosineTopPairs]]) instead of the row-per-pair self-join; each
    * chunk pair pre-prunes to its local top-50 under the provably safe
    * raw cutoff, so the global sort sees ~50·#chunk-pairs rows instead
    * of every pair. Values are bit-identical (same fold, same norms,
    * same rounding) — only the execution shape changed. */
  val qSimCosine: QDef = QDef(
    "q_sim_cosine",
    s"""$oracleNorms
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ROUND(list_sum(list_transform(range(1, 65),
       |    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 4) AS cos
       |FROM n a JOIN n b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |ORDER BY cos DESC, vec_a, vec_b
       |LIMIT 50""".stripMargin) { (s, d) =>
    cosineTopPairs(s, d)
      .select(
        col("vec_a"), col("vec_b"), round(col("raw_cos"), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
      .limit(50)
  }

  /** k-NN: top-20 vectors most similar to the query vector (vec_id 0),
    * broadcast against the corpus — the exact-search primitive that at
    * 100 TB gets an LSH/IVF pre-filter (qAnnLsh) + this as re-rank. */
  val qSimQueryTopk: QDef = QDef(
    "q_sim_query_topk",
    s"""$oracleNorms
       |SELECT a.vec_id,
       |  ROUND(list_sum(list_transform(range(1, 65),
       |    i -> a.v[i] * q.v[i])) / (a.nrm * q.nrm), 4) AS cos
       |FROM n a, (SELECT v, nrm FROM n WHERE vec_id = 0) q
       |WHERE a.vec_id <> 0
       |ORDER BY cos DESC, vec_id
       |LIMIT 20""".stripMargin) { (s, d) =>
    val e = embeddings(s, d)
      .select(
        col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qnrm"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        round(dot(col("embedding"), col("qv")) / (col("nrm") * col("qnrm")),
          4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }

  /** Deterministic random hyperplanes for sign-LSH: nPlanes × dim
    * coefficients from a fixed-seed RNG (pure function of the seed —
    * reproducible across runs and executors). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L):
      Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** PORTABLE sign-LSH planes: Rademacher ±1 coefficients derived
    * from md5 — w(p, i) = +1 iff the first md5 nibble of "pl{p}_{i}"
    * is odd — so a DuckDB oracle can rebuild the identical plane
    * matrix from its own md5 (the same cross-engine anchor as the
    * dedup family). Sign random projections with ±1 entries are the
    * standard cheap variant of the Gaussian family (Achlioptas-style
    * sparse/signed projections): collision probability stays
    * monotone in the angle, banding analysis unchanged to first
    * order, and at 100 TB the multiply per element becomes a sign
    * flip. */
  def rademacherPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        md.reset()
        val d = md.digest(s"pl${p}_${i}".getBytes("UTF-8"))
        if (((d(0) >> 4) & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** Sign-random-projection signature: bit j = (v · plane_j) > 0,
    * packed into a BIGINT. */
  def lshSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val plane = array(p.map(lit): _*)
      val dot = aggregate(
        zip_with(v, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce((x, y) => x.bitwiseOR(y))

  /** ANN via banded sign-LSH: 8 planes → 2 bands of 4 bits; a vector is
    * a candidate if it shares ANY band with the query (multi-probe
    * banding), then exact cosine re-ranks the candidate set. At 100 TB
    * the band join is a shuffle on (band_idx, band_key) — candidates
    * per bucket ~ n/2^bits, never O(n²). ORACLE-GATED since round 11:
    * the planes are md5-derived ±1 ([[rademacherPlanes]]), so DuckDB
    * rebuilds the identical signatures, bands, candidate set, and
    * re-ranked top-k; AnnSpec keeps the planted-neighbor recall and
    * brute-force-exactness assertions. */
  val qAnnLsh: QDef = QDef(
    "q_ann_lsh",
    s"""$oracleNorms,
       |pw AS (
       |  SELECT p.p AS p,
       |    list_transform(range(1, 65), i ->
       |      CASE WHEN (CAST(('0x' || substr(
       |          md5('pl' || p.p || '_' || (i - 1)), 1, 1)) AS INT)
       |          & 1) = 1
       |        THEN 1.0 ELSE -1.0 END) AS wv
       |  FROM (SELECT unnest(range(8)) AS p) p),
       |dots AS (
       |  SELECT n.vec_id, pw.p,
       |    list_sum(list_transform(range(1, 65),
       |      i -> n.v[i] * pw.wv[i])) AS dp
       |  FROM n CROSS JOIN pw),
       |bands AS (
       |  SELECT vec_id, p // 4 AS band_idx,
       |    SUM(CASE WHEN dp > 0
       |      THEN (CAST(1 AS BIGINT) << (p % 4)) ELSE 0 END) AS band_key
       |  FROM dots GROUP BY vec_id, p // 4),
       |qb AS (SELECT band_idx, band_key FROM bands WHERE vec_id = 0),
       |cand AS (
       |  SELECT DISTINCT b.vec_id FROM bands b
       |  JOIN qb ON b.band_idx = qb.band_idx
       |    AND b.band_key = qb.band_key
       |  WHERE b.vec_id <> 0),
       |scored AS (
       |  SELECT c.vec_id,
       |    ROUND(list_sum(list_transform(range(1, 65),
       |      i -> na.v[i] * q.v[i])) / (na.nrm * q.nrm), 4) AS cos
       |  FROM cand c
       |  JOIN n na ON na.vec_id = c.vec_id
       |  JOIN n q ON q.vec_id = 0)
       |SELECT vec_id, cos FROM scored
       |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
    annTopK(s, d, queryVecId = 0L, k = 10)
  }

  /** LSH-bucketed top-k for one query vector (library form).
    *
    * Recall regime (honestly): sign-LSH banding retrieves neighbors
    * whose cosine is HIGH (bit-agreement p = 1 − θ/π per plane, so a
    * cos 0.9 neighbor survives a 4-bit band with p ≈ 0.66 and either
    * of 2 bands with p ≈ 0.88). On near-random corpora whose top-k
    * sits at cos ≈ 0.3 (the synthetic fixture), NO sub-linear index
    * can prune and keep recall — use brute-force qSimQueryTopk there;
    * the spec asserts the high-cos guarantee with a planted neighbor. */
  def annTopK(s: SparkSession, d: String, queryVecId: Long, k: Int)
      : DataFrame =
    annTopKFrom(embeddings(s, d), queryVecId, k)

  /** As [[annTopK]] but over any (vec_id, embedding) corpus. */
  def annTopKFrom(corpus: DataFrame, queryVecId: Long, k: Int)
      : DataFrame = {
    // md5-derived ±1 planes: cross-engine-reproducible signatures
    // (see rademacherPlanes; the q_ann_lsh oracle rebuilds them)
    val planes = rademacherPlanes(8, 64)
    val nBands = 2
    val bitsPerBand = 4
    val e = corpus
      .withColumn("sig", lshSignature(col("embedding"), planes))
    val banded = e.select(
      col("vec_id"), col("embedding"),
      explode(array((0 until nBands).map { b =>
        struct(
          lit(b).as("band_idx"),
          shiftright(col("sig"), b * bitsPerBand)
            .bitwiseAND(lit((1 << bitsPerBand) - 1)).as("band_key"))
      }: _*)).as("band"))
      .select(
        col("vec_id"), col("embedding"),
        col("band.band_idx").as("band_idx"),
        col("band.band_key").as("band_key"))
    val qBands = banded.filter(col("vec_id") === queryVecId)
      .select(
        col("band_idx").as("q_band_idx"), col("band_key").as("q_band_key"),
        col("embedding").as("qv"))
    banded
      .join(
        broadcast(qBands),
        col("band_idx") === col("q_band_idx")
          && col("band_key") === col("q_band_key")
          && col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("embedding"), col("qv"))
      .distinct()
      .select(
        col("vec_id"),
        round(cosine(col("embedding"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Corpus-scale embedding near-dup: sign-LSH banded self-join for
    * candidates, exact cosine verify — the 100 TB path that replaces
    * qDedupEmbedding's label-blocked pairwise scan.
    *
    * 120 planes → 10 bands × 12 bits: a pair at cosine ≥ 0.95 agrees on
    * a given bit with p ≈ 1 - θ/π ≈ 0.9, so P(any intact band) ≈
    * 1-(1-0.9¹²)¹⁰ ≈ 0.96 — high recall for true near-dups, while
    * random pairs share a 12-bit bucket with p ≈ 2⁻¹² per band, keeping
    * candidate volume ≈ 10·n²/4096 of the quadratic worst case (8-bit
    * bands measured 13× more candidates at sf0.1 for +3 pts of recall —
    * the standard LSH dial). Precision is exact: every candidate is
    * verified with the true cosine. Heavy embedding arrays do NOT ride
    * the banded explode/join; candidate pairs re-join them for
    * verification.
    */
  def embeddingNearDupPairs(
      vecs: DataFrame,
      threshold: Double = 0.9,
      nBands: Int = 10,
      bitsPerBand: Int = 12): DataFrame = {
    // md5-derived ±1 planes (rademacherPlanes): the whole candidate
    // pipeline — planes, dots, signs, band keys — is reproducible in
    // DuckDB, which is what put q_dedup_embedding_lsh under the hash
    // gate in round 11; dot products are strictly sequential i=0..63
    // in both engines, so even their rounding is bit-identical
    val planes = rademacherPlanes(nBands * bitsPerBand, dim)
      .flatten.toArray
    // all band keys in ONE fused codegen loop (BandedSignKeys) — the
    // composed per-plane Column form measured 15× slower at 120 planes
    val banded = vecs
      .select(
        col("vec_id"),
        posexplode(graft.functions.VectorExpressions.bandedSignKeys(
          col("embedding"), planes, dim, nBands, bitsPerBand)))
      .select(
        col("vec_id"),
        col("pos").as("band_idx"),
        col("col").as("band_key"))
    val candidates = banded.alias("a")
      .join(
        banded.alias("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_key") === col("b.band_key")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val e = vecs.select(
      col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
    val ea = e.select(
      col("vec_id").as("vec_a"), col("embedding").as("va"),
      col("nrm").as("nrm_a"))
    val eb = e.select(
      col("vec_id").as("vec_b"), col("embedding").as("vb"),
      col("nrm").as("nrm_b"))
    candidates
      .join(ea, "vec_a")
      .join(eb, "vec_b")
      .select(
        col("vec_a"), col("vec_b"),
        (dot(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")))
          .as("raw_cos"))
      .filter(col("raw_cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("raw_cos"), 4).as("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Declared query form. ORACLE-GATED since round 11: the ±1 planes
    * are md5-derived ([[rademacherPlanes]]), so DuckDB rebuilds the
    * identical plane matrix, the identical sequential ±v[i] dot sums
    * (every product is EXACT — float→double then a sign flip — and
    * the addition sequence matches BandedSignKeys' i=0..63 loop), the
    * same 10 × 12-bit band keys, candidates, and cosine-verified
    * pairs. AnnSpec still asserts recall on seeded near-dups and
    * exactness of the verify step. */
  val qDedupEmbeddingLsh: QDef = QDef(
    "q_dedup_embedding_lsh",
    s"""$oracleNorms,
       |pw AS (
       |  SELECT p.p AS p,
       |    list_transform(range(1, 65), i ->
       |      CASE WHEN (CAST(('0x' || substr(
       |          md5('pl' || p.p || '_' || (i - 1)), 1, 1)) AS INT)
       |          & 1) = 1
       |        THEN 1.0 ELSE -1.0 END) AS wv
       |  FROM (SELECT unnest(range(120)) AS p) p),
       |dots AS (
       |  SELECT n.vec_id, pw.p,
       |    list_sum(list_transform(range(1, 65),
       |      i -> n.v[i] * pw.wv[i])) AS dp
       |  FROM n CROSS JOIN pw),
       |bands AS (
       |  SELECT vec_id, p // 12 AS band_idx,
       |    SUM(CASE WHEN dp > 0
       |      THEN (CAST(1 AS BIGINT) << (p % 12)) ELSE 0 END) AS band_key
       |  FROM dots GROUP BY vec_id, p // 12),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |      AND a.vec_id < b.vec_id),
       |vf AS (
       |  SELECT c.vec_a, c.vec_b,
       |    list_sum(list_transform(range(1, 65),
       |      i -> na.v[i] * nb.v[i])) / (na.nrm * nb.nrm) AS raw_cos
       |  FROM cand c
       |  JOIN n na ON na.vec_id = c.vec_a
       |  JOIN n nb ON nb.vec_id = c.vec_b)
       |SELECT vec_a, vec_b, ROUND(raw_cos, 4) AS cos
       |FROM vf WHERE raw_cos >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin) {
    // cosine floor 0.4 HERE (not the function's 0.9 default), r12:
    // the fixture embeddings are near-orthogonal — the corpus-wide
    // max pairwise cosine is ~0.46 at BOTH sf0.01 and sf0.1 — so the
    // 0.9 floor made this hash gate compare empty-to-empty at every
    // scale (r11 verdict "vacuous"). 0.4 keeps the full banded-LSH +
    // exact-verify pipeline under test with real survivors (3 pairs
    // at sf0.01, 27 at sf0.1); AnnSpec keeps exercising the 0.9
    // production floor on seeded true near-dups.
    (s, d) => embeddingNearDupPairs(embeddings(s, d), threshold = 0.4)
  }

  /** kNN label vote — the weak-supervision / label-propagation
    * primitive: predict each UNLABELED-pretend query vector's label
    * from the majority label of its 20 exact nearest neighbours (ties
    * toward the smaller label). Composes the top-k primitive with the
    * deterministic count→rank mode; one row per query vector from the
    * sampled query set (vec_id < 5). At 100 TB the neighbour search is
    * the ANN path (qAnnLsh/IvfAnn); the vote is a per-query-small
    * aggregation either way. */
  val qKnnClassify: QDef = QDef(
    "q_knn_classify",
    s"""$oracleNorms,
       |scored AS (
       |  SELECT q.vec_id AS query_id, a.label,
       |    list_sum(list_transform(range(1, 65),
       |      i -> a.v[i] * q.v[i])) / (a.nrm * q.nrm) AS cos,
       |    a.vec_id
       |  FROM n a JOIN n q ON q.vec_id < 5 AND a.vec_id >= 5),
       |topk AS (
       |  SELECT * FROM (
       |    SELECT query_id, label,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, vec_id) AS rnk
       |    FROM scored)
       |  WHERE rnk <= 20),
       |votes AS (
       |  SELECT query_id, label, COUNT(*) AS n_votes,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY COUNT(*) DESC, label) AS INT) AS vr
       |  FROM topk GROUP BY query_id, label)
       |SELECT query_id, label AS predicted, n_votes
       |FROM votes WHERE vr = 1
       |ORDER BY query_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("qv"), col("nrm").as("qnrm"))
    val scored = e.filter(col("vec_id") >= 5)
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col("label"), col("vec_id"),
        (dot(col("embedding"), col("qv"))
          / (col("nrm") * col("qnrm"))).as("cos"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val topk = scored.withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 20)
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("label"))
    topk.groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("label").as("predicted"),
        col("n_votes"))
      .orderBy(col("query_id"))
  }

  /** Label-noise audit (confident-learning lite): for a deterministic
    * probe sample (vec_id % 50 = 0), vote the 10 nearest neighbors'
    * labels (cosine, self excluded) and report probes whose OWN label
    * loses the vote — the mislabel/outlier curation queue. Probe set
    * broadcast against the corpus, so the pair count is
    * |probes| × n, never n²; at 100 TB the ANN index (qAnnLsh/IVF)
    * supplies the candidate set instead of the full scan. */
  val qMislabelKnn: QDef = QDef(
    "q_mislabel_knn",
    s"""$oracleNorms,
       |scored AS (
       |  SELECT q.vec_id AS probe_id, q.label AS own_label,
       |    a.label, a.vec_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> a.v[i] * q.v[i])) / (a.nrm * q.nrm) AS cos
       |  FROM n a JOIN n q
       |    ON q.vec_id % 50 = 0 AND a.vec_id <> q.vec_id),
       |topk AS (
       |  SELECT * FROM (
       |    SELECT probe_id, own_label, label,
       |      ROW_NUMBER() OVER (PARTITION BY probe_id
       |        ORDER BY cos DESC, vec_id) AS rnk
       |    FROM scored)
       |  WHERE rnk <= 10),
       |votes AS (
       |  SELECT probe_id, own_label, label, COUNT(*) AS n_votes,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id
       |      ORDER BY COUNT(*) DESC, label) AS vr
       |  FROM topk GROUP BY probe_id, own_label, label)
       |SELECT probe_id, own_label, label AS voted_label,
       |  CAST(n_votes AS BIGINT) AS n_votes
       |FROM votes
       |WHERE vr = 1 AND label <> own_label
       |ORDER BY probe_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"),
        col("label").as("own_label"),
        col("embedding").as("qv"), col("nrm").as("qnrm"))
    val scored = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("own_label"), col("label"),
        col("vec_id"),
        (dot(col("embedding"), col("qv"))
          / (col("nrm") * col("qnrm"))).as("cos"))
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val wVote = Window.partitionBy(col("probe_id"))
      .orderBy(col("n_votes").desc, col("label"))
    scored.withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 10)
      .groupBy(col("probe_id"), col("own_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1 && col("label") =!= col("own_label"))
      .select(col("probe_id"), col("own_label"),
        col("label").as("voted_label"), col("n_votes"))
      .orderBy(col("probe_id"))
  }

  /** MAP@10 retrieval evaluation: vectors 0..4 are the query set, the
    * rest the candidate corpus, relevance = same label. Per query:
    * rank candidates by (4dp cosine DESC, vec_id) — the rounded key,
    * so the rank order is cross-engine exact — and compute average
    * precision over the top 10 with the standard min(R, k)
    * denominator. Each AP term quantizes precision@i to integer
    * 1e-8 units before the per-query sum (10-term double sums are
    * partial-order-dependent). Scale shape: queries broadcast, cost
    * |queries|·n, rank windows PARTITIONED by query. */
  val qMapAtK: QDef = QDef(
    "q_map_at_k",
    s"""$oracleNorms,
       |q AS (
       |  SELECT vec_id AS qid, label AS qlabel, v AS qv, nrm AS qnrm
       |  FROM n WHERE vec_id < 5),
       |c AS (
       |  SELECT q.qid, a.vec_id,
       |    CASE WHEN a.label = q.qlabel THEN 1 ELSE 0 END AS rel,
       |    ROUND(list_sum(list_transform(range(1, 65),
       |      i -> a.v[i] * q.qv[i])) / (a.nrm * q.qnrm), 4) AS cos
       |  FROM n a CROSS JOIN q WHERE a.vec_id >= 5),
       |r AS (
       |  SELECT qid, rel,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, vec_id) AS rnk
       |  FROM c),
       |t AS (
       |  SELECT qid, CAST(SUM(rel) AS BIGINT) AS n_rel
       |  FROM r GROUP BY qid),
       |h AS (
       |  SELECT qid, rel, rnk,
       |    SUM(rel) OVER (PARTITION BY qid ORDER BY rnk) AS cum_rel
       |  FROM r WHERE rnk <= 10),
       |ap AS (
       |  SELECT qid,
       |    CAST(SUM(CASE WHEN rel = 1 THEN
       |      CAST(FLOOR(cum_rel * 100000000.0 / rnk) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS s_micro
       |  FROM h GROUP BY qid)
       |SELECT t.qid, t.n_rel,
       |  ROUND(ap.s_micro / 100000000.0 / LEAST(t.n_rel, 10), 4)
       |    AS ap_at_10
       |FROM ap JOIN t ON ap.qid = t.qid
       |ORDER BY t.qid""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, d).select(
      col("vec_id"), col("label"), col("embedding"),
      l2norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < 5).select(
      col("vec_id").as("qid"), col("label").as("qlabel"),
      col("embedding").as("qv"), col("nrm").as("qnrm"))
    val c = e.filter(col("vec_id") >= 5)
      .crossJoin(broadcast(q))
      .select(
        col("qid"), col("vec_id"),
        when(col("label") === col("qlabel"), 1).otherwise(0).as("rel"),
        round(dot(col("embedding"), col("qv")) /
          (col("nrm") * col("qnrm")), 4).as("cos"))
    val r = c.select(col("qid"), col("rel"),
      row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))).as("rnk"))
    val t = r.groupBy(col("qid"))
      .agg(sum(col("rel")).cast("bigint").as("n_rel"))
    val h = r.filter(col("rnk") <= 10)
      .select(col("qid"), col("rel"), col("rnk"),
        sum(col("rel")).over(Window.partitionBy(col("qid"))
          .orderBy(col("rnk"))).as("cum_rel"))
    val ap = h.groupBy(col("qid"))
      .agg(sum(when(col("rel") === 1,
        floor(col("cum_rel") * lit(100000000.0) / col("rnk"))
          .cast("bigint")).otherwise(0L)).cast("bigint").as("s_micro"))
    ap.join(t, "qid")
      .select(col("qid"), col("n_rel"),
        round(col("s_micro") / lit(100000000.0) /
          least(col("n_rel"), lit(10)), 4).as("ap_at_10"))
      .orderBy(col("qid"))
  }

  val defs: Seq[QDef] =
    Seq(qSimCosine, qSimQueryTopk, qAnnLsh, qDedupEmbeddingLsh,
      qKnnClassify, qMislabelKnn, qMapAtK)
}
