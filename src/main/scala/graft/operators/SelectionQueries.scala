package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Pretraining data SELECTION — two public methods the curation stack
  * was still missing, composed from the engine's existing primitives:
  *
  *   - DSIR (Xie et al., "Data Selection for Language Models via
  *     Importance Resampling", NeurIPS 2023): score every raw document
  *     by a hashed-n-gram importance weight log p_target(x)/p_raw(x) —
  *     how target-like its token statistics are. The weights feed the
  *     engine's seeded weighted sampler (q_sample_weighted's A-ES
  *     shape) for the actual resample; the scoring itself is what runs
  *     over 100 TB, and it is two bounded hash-aggregates plus a
  *     broadcast join: the bucket table is FIXED-size (1024 rows), so
  *     no shuffle ever carries more than |docs| rows.
  *   - SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
  *     web-scale through semantic deduplication", 2023): k-means the
  *     embedding space, then prune cosine near-duplicates WITHIN each
  *     cluster only. The clustering is the scale device — it turns the
  *     n² semantic-pair problem into Σ|cluster|² with cluster count
  *     growing with corpus size; a per-cluster pair budget makes the
  *     quadratic-regression failure mode an explicit error pointing at
  *     the banded-LSH path instead of a silent 100× job.
  */
object SelectionQueries {

  private val dsirBuckets = 1024
  // add-α smoothing; α·B folded into the denominator constant
  private val dsirAlpha = 0.5

  /** md5-prefix feature bucket — the engine-portable hash convention
    * (q_feature_hash): DuckDB computes the identical value from
    * `('0x' || substr(md5(bg), 1, 4))::INT % B`. */
  private def bucketOf(c: Column): Column =
    (graft.functions.Md5HexSlice(c.cast("binary"), 1, 4)
      .cast("int") % dsirBuckets).cast("int")

  /** Hashed-bigram features of every document: (doc_id, lang, bucket),
    * one row per bigram occurrence. */
  private def dsirFeatures(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(expr("transform(sequence(1, size(l) - 1), " +
          "i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"))
          .as("bg"))
      .select(col("doc_id"), col("lang"), bucketOf(col("bg")).as("bucket"))

  /** Shared SQL CTE chain ending in `dw(doc_id, n_grams, lw_micro)` —
    * the per-doc micro-quantized DSIR log-weight both oracle queries
    * build on. */
  private val dsirDwSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS l
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, lang, UNNEST(list_transform(range(1, len(l)),
      |    i -> l[i] || ' ' || l[i + 1])) AS bg
      |  FROM t WHERE len(l) >= 2),
      |f AS (
      |  SELECT doc_id, lang,
      |    CAST(CAST(('0x' || substr(md5(bg), 1, 4)) AS INT)
      |      % $dsirBuckets AS INT) AS bucket
      |  FROM b),
      |r AS (SELECT bucket, COUNT(*) AS c_r FROM f GROUP BY 1),
      |tg AS (SELECT bucket, COUNT(*) AS c_t FROM f
      |  WHERE lang = 'en' GROUP BY 1),
      |nr AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_r FROM f),
      |nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_t FROM f
      |  WHERE lang = 'en'),
      |lam AS (
      |  SELECT r.bucket,
      |    CAST(FLOOR(LN((COALESCE(c_t, 0) + $dsirAlpha)
      |        / (n_t + ${dsirAlpha * dsirBuckets})) * 1e6) AS BIGINT)
      |    - CAST(FLOOR(LN((c_r + $dsirAlpha)
      |        / (n_r + ${dsirAlpha * dsirBuckets})) * 1e6) AS BIGINT)
      |      AS lam_micro
      |  FROM r LEFT JOIN tg ON r.bucket = tg.bucket
      |  CROSS JOIN nr CROSS JOIN nt),
      |dc AS (
      |  SELECT doc_id, bucket, COUNT(*) AS c FROM f GROUP BY 1, 2),
      |dw AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
      |    CAST(SUM(c * lam_micro) AS BIGINT) AS lw_micro
      |  FROM dc JOIN lam USING (bucket)
      |  GROUP BY doc_id)""".stripMargin

  /** Per-doc DSIR weight frame: (doc_id, n_grams BIGINT, lw_micro
    * BIGINT) — the Spark twin of [[dsirDwSql]]'s `dw` CTE. */
  private def dsirDocWeights(s: SparkSession, d: String): DataFrame = {
    val f = dsirFeatures(s, d)
    // ONE conditional hash-aggregate computes raw AND target bucket
    // counts together (the target distribution is a filter of the same
    // rows, so a second scan would be pure waste); the corpus totals
    // n_r/n_t are 1024-row sums over THIS table, not extra corpus
    // scans. Two explode passes total (here + the per-doc aggregate
    // below) — down from the five a naive subtree-per-CTE plan runs.
    val byBucket = f.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_r"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_t"))
    val totals = broadcast(byBucket
      .agg(sum(col("c_r")).cast("double").as("n_r"),
        sum(col("c_t")).cast("double").as("n_t")))
    val denomAdd = lit(dsirAlpha * dsirBuckets)
    val lam = byBucket.crossJoin(totals)
      .select(col("bucket"),
        (floor(log((col("c_t") + lit(dsirAlpha))
            / (col("n_t") + denomAdd)) * lit(1e6)).cast("bigint")
          - floor(log((col("c_r") + lit(dsirAlpha))
            / (col("n_r") + denomAdd)) * lit(1e6)).cast("bigint"))
          .as("lam_micro"))
    f.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(lam), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("bigint").as("n_grams"),
        sum(col("c") * col("lam_micro")).cast("bigint").as("lw_micro"))
  }

  /** DSIR importance weights with `lang = 'en'` as the target
    * distribution (the realistic stand-in for "docs resembling the
    * curated target domain"). Per-bucket log-ratios are micro-quantized
    * integers (the q_kneser_ney discipline: floor(ln(p)·1e6) on
    * identical doubles both engines), so the per-doc sum is exact
    * BIGINT arithmetic and the whole query sits under the DuckDB hash
    * gate despite the ln().
    *
    * Scale shape: two explode passes over the corpus — one conditional
    * hash-aggregate producing raw AND target counts in a single FIXED
    * 1024-row bucket table, then per-(doc, bucket) counts joined
    * against the broadcast λ table and a final per-doc aggregate.
    * Nothing quadratic, nothing wider than the corpus ever shuffles;
    * the λ table is the only state and it is 1024 rows at ANY corpus
    * size. */
  val qDsirWeights: QDef = QDef(
    "q_dsir_weights",
    s"""$dsirDwSql
      |SELECT doc_id, n_grams,
      |  CAST(lw_micro AS DOUBLE) / 1e6 AS log_w
      |FROM dw
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    dsirDocWeights(s, d)
      .select(col("doc_id"), col("n_grams"),
        (col("lw_micro").cast("double") / lit(1e6)).as("log_w"))
      .orderBy(col("doc_id"))
  }

  /** The DSIR RESAMPLE itself — the step the paper's weights exist
    * for: Gumbel-top-k over the log-weights (argmax of log w + G with
    * i.i.d. Gumbel noise draws k docs WITHOUT replacement with
    * probability ∝ w — the log-space twin of q_sample_weighted's
    * A-ES keys). The Gumbel draw is content-keyed and deterministic:
    * u from the doc_id's md5 (the engine's seeded-uniform convention),
    * G = −ln(−ln u), micro-quantized to an exact BIGINT so the sort
    * key lw_micro + g_micro is pure integer arithmetic — no float
    * boundary can reorder the two engines at the LIMIT edge. Top-k by
    * key is a TakeOrdered, never a global sort. */
  val qDsirSample: QDef = QDef(
    "q_dsir_sample",
    s"""$dsirDwSql,
      |g AS (
      |  SELECT doc_id, lw_micro,
      |    CAST(FLOOR(-LN(-LN(
      |      (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |         AS BIGINT) + 1.0) / 4294967297.0)) * 1e6) AS BIGINT)
      |      AS g_micro
      |  FROM dw)
      |SELECT doc_id,
      |  CAST(lw_micro AS DOUBLE) / 1e6 AS log_w,
      |  CAST(lw_micro + g_micro AS DOUBLE) / 1e6 AS key
      |FROM g
      |ORDER BY lw_micro + g_micro DESC, doc_id
      |LIMIT 50""".stripMargin) { (s, d) =>
    val u = (graft.functions.Md5HexSlice(
      col("doc_id").cast("string").cast("binary"), 1, 8)
      + lit(1.0)) / lit(4294967297.0)
    dsirDocWeights(s, d)
      .withColumn("g_micro", floor(-log(-log(u)) * lit(1e6)).cast("bigint"))
      .withColumn("key_micro", col("lw_micro") + col("g_micro"))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(50)
      .select(col("doc_id"),
        (col("lw_micro").cast("double") / lit(1e6)).as("log_w"),
        (col("key_micro").cast("double") / lit(1e6)).as("key"))
  }

  /** Gopher-style rule filter (Rae et al., "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", 2021 — the
    * public heuristic rule-set later adopted by FineWeb/Dolma): unlike
    * q_quality_score's single composite score, this emits the
    * individual REJECT REASONS a curation pipeline reports per rule —
    * word-count bounds [50, 100k], mean word length in [3, 10],
    * fraction of words containing an alphabetic character ≥ 0.8, and
    * ≥ 2 distinct stop-word hits — plus the conjunctive keep bit.
    * Flags are 0/1 INTs (the registry has no boolean outputs — INT
    * renders identically in both engines' CSV/hash paths), and every
    * threshold compares the UNROUNDED ratio: each ratio is one IEEE
    * divide of exact integers, bit-identical cross-engine, so no
    * boundary flap. One scan, no shuffle at all (pure per-row map +
    * final order), the cheapest filter in the stack — which is the
    * point: Gopher rules run before anything that shuffles. */
  val qGopherRules: QDef = QDef(
    "q_gopher_rules",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CAST(len(l) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(l, w -> length(w))) AS DOUBLE)
      |      / len(l) AS mwl,
      |    CAST(len(list_filter(l, w -> regexp_matches(w, '[A-Za-z]')))
      |      AS DOUBLE) / len(l) AS alpha_ratio,
      |    CAST(len(list_intersect(list_distinct(l),
      |      ['the', 'a', 'of', 'and', 'to'])) AS BIGINT) AS stop_hits
      |  FROM t)
      |SELECT doc_id, n_words,
      |  ROUND(mwl, 4) AS mean_word_len,
      |  ROUND(alpha_ratio, 4) AS alpha_word_ratio,
      |  stop_hits,
      |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000
      |    THEN 1 ELSE 0 END AS INT) AS ok_words,
      |  CAST(CASE WHEN mwl BETWEEN 3 AND 10
      |    THEN 1 ELSE 0 END AS INT) AS ok_wlen,
      |  CAST(CASE WHEN alpha_ratio >= 0.8
      |    THEN 1 ELSE 0 END AS INT) AS ok_alpha,
      |  CAST(CASE WHEN stop_hits >= 2
      |    THEN 1 ELSE 0 END AS INT) AS ok_stop,
      |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000
      |    AND mwl BETWEEN 3 AND 10 AND alpha_ratio >= 0.8
      |    AND stop_hits >= 2 THEN 1 ELSE 0 END AS INT) AS keep
      |FROM g
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val l = split(col("text"), " ")
    val nWords = size(l).cast("bigint")
    val mwl = aggregate(transform(l, w => length(w)), lit(0L),
      (acc, x) => acc + x).cast("double") / size(l)
    val alphaRatio = size(filter(l, w => w.rlike("[A-Za-z]")))
      .cast("double") / size(l)
    val stopHits = size(array_intersect(array_distinct(l),
      array(Seq("the", "a", "of", "and", "to").map(lit): _*)))
      .cast("bigint")
    def flag(c: Column): Column = when(c, 1).otherwise(0).cast("int")
    documents(s, d)
      .select(col("doc_id"),
        nWords.as("n_words"), mwl.as("mwl"),
        alphaRatio.as("alpha_ratio"), stopHits.as("stop_hits"))
      .select(col("doc_id"), col("n_words"),
        round(col("mwl"), 4).as("mean_word_len"),
        round(col("alpha_ratio"), 4).as("alpha_word_ratio"),
        col("stop_hits"),
        flag(col("n_words").between(50, 100000)).as("ok_words"),
        flag(col("mwl").between(3, 10)).as("ok_wlen"),
        flag(col("alpha_ratio") >= 0.8).as("ok_alpha"),
        flag(col("stop_hits") >= 2).as("ok_stop"),
        flag(col("n_words").between(50, 100000)
          && col("mwl").between(3, 10)
          && col("alpha_ratio") >= 0.8
          && col("stop_hits") >= 2).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Corpus embedding DIVERSITY per label — the selection signal dual
    * to dedup: mean pairwise cosine over all C(n,2) pairs, computed in
    * ONE O(n·d) pass with zero pairs materialized via the sum-vector
    * identity  Σ_{i≠j} cos(vᵢ,vⱼ) = ‖Σ v̂‖² − Σ‖v̂‖²  on the
    * normalized vectors. A near-1 mean says the label's corpus is
    * semantically collapsed (near-dup farm → route to SemDeDup); near
    * 0 says diverse. This is the quantity people estimate by sampling
    * pairs — here it is EXACT and linear, the plan a 100 TB curation
    * run actually wants.
    *
    * Determinism: normalized components are quantized to 1e-6 integer
    * units per row (every op on the way — fixed-order per-dim fold,
    * divide, multiply, FLOOR — is correctly-rounded IEEE, so the
    * BIGINT is identical cross-engine); per-dim sums S_i and squared
    * sums accumulate as exact integers (DECIMAL(38) on the Spark side,
    * HUGEINT in DuckDB — order-free), and the only double arithmetic
    * is the final fixed-order fold of d squares. Both engines derive d
    * from the array itself (posexplode / zipped UNNEST) — no
    * dimension literal anywhere, so a non-64-dim corpus cannot
    * silently diverge. */
  val qEmbedDiversity: QDef = QDef(
    "q_embed_diversity",
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |nz AS (
      |  SELECT vec_id, label, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      |  FROM e),
      |q AS (
      |  SELECT vec_id, label,
      |    list_transform(v, x -> CAST(FLOOR(x / nrm * 1e6) AS BIGINT))
      |      AS qv
      |  FROM nz WHERE nrm > 0),
      |ex AS (
      |  SELECT label,
      |    UNNEST(qv) AS qx,
      |    UNNEST(generate_series(1, len(qv))) AS i
      |  FROM q),
      |per AS (
      |  SELECT label, i, SUM(qx) AS s_i,
      |    SUM(CAST(qx AS HUGEINT) * qx) AS ssq, COUNT(*) AS cnt
      |  FROM ex GROUP BY label, i),
      |ag AS (
      |  SELECT label,
      |    list_sum(list_transform(list(CAST(s_i AS DOUBLE) ORDER BY i),
      |      x -> x * x)) AS s2,
      |    CAST(SUM(ssq) AS DOUBLE) AS sumq2,
      |    MAX(cnt) AS n
      |  FROM per GROUP BY label)
      |SELECT label, CAST(n AS BIGINT) AS n_vecs,
      |  ROUND((s2 - sumq2) / (CAST(n AS DOUBLE) * (n - 1) * 1e12), 6)
      |    + 0.0 AS mean_pair_cos
      |FROM ag
      |WHERE n > 1
      |ORDER BY label""".stripMargin) { (s, d) =>
    val v = transform(col("embedding"), x => x.cast("double"))
    val dotVV = aggregate(transform(v, x => x * x), lit(0.0),
      (acc, x) => acc + x)
    val nrm = sqrt(dotVV)
    // the when() guard keeps ANSI divide from evaluating on the
    // zero-norm rows the filter excludes (filter/project eval order is
    // not guaranteed rowwise under codegen)
    val q = embeddings(s, d)
      .withColumn("nrm", nrm)
      .where(col("nrm") > 0)
      .select(col("vec_id"), col("label"),
        when(col("nrm") > 0,
          transform(v, x => floor(x / col("nrm") * lit(1e6))
            .cast("bigint")))
          .as("qv"))
    // ONE posexplode pass yields every per-label statistic at once:
    // per-dim exact sums S_i (for ‖Σv̂‖²), per-dim Σqx² (whose total
    // over dims IS Σ‖v̂‖² — no second scan for the per-row norms), and
    // n as the per-dim row count (every dim appears once per vector).
    // The shuffle carries |labels|·d rows, nothing corpus-sized; each
    // qx² ≤ 1e12 fits bigint, the cross-row sum accumulates as
    // DECIMAL(38) (exact, order-free).
    // r14 opt (guide §1.2 per-task work): the per-dim exact sums used
    // to be computed by posexploding every vector to n·d rows and
    // hash-aggregating by (label, pos) — ~200 ns/element of hash-probe
    // work that dominated at volume (13.4 s at the 10× probe; an A/B
    // proved the Decimal-vs-Long accumulator width irrelevant,
    // 13.44 → 13.12 s). VectorSumAgg keeps the identical integer sums
    // (element-wise Long adds, order-free) in ONE tight array loop per
    // row, shuffling 2·d longs per (partition, label) instead of
    // |labels|·d aggregate rows of exploded input: 1.61 → 0.39 s at
    // sf0.1, 13.4 → 1.08 s at the 10× probe. Σ‖v̂‖² needs no per-dim
    // grain at all — the row-local Σ_d qx² (≤ d·1e12 ≈ 6.4e13, exact
    // in Long) crosses rows as DECIMAL(38), one update per ROW. Label
    // groups are bounded, so the typed aggregate's
    // ObjectHashAggregate 128-group fallback (spark-plan-pitfalls) is
    // structurally unreachable.
    val rowq2 = aggregate(
      transform(col("qv"), x => x * x), lit(0L), (acc, x) => acc + x)
    q.groupBy(col("label"))
      .agg(graft.functions.VectorSumAgg(col("qv")).as("vc"),
        sum(rowq2.cast("decimal(38,0)")).cast("double").as("sumq2"))
      .select(col("label"),
        array_max(col("vc.counts")).as("n"),
        col("vc.sums").as("sums"), col("sumq2"))
      .where(col("n") > 1)
      .select(col("label"), col("n").cast("bigint").as("n_vecs"),
        (round((aggregate(
            transform(col("sums"), x => x.cast("double")),
            lit(0.0), (acc, x) => acc + x * x) - col("sumq2"))
          / (col("n").cast("double") * (col("n") - 1) * lit(1e12)), 6)
          + lit(0.0)).as("mean_pair_cos"))
      .orderBy(col("label"))
  }

  /** Per-cluster ROW budget for SemDeDup's within-cluster quadratic:
    * a cluster larger than this raises instead of silently regressing
    * toward all-pairs (SemDeDup's own contract is cluster count ∝
    * corpus size, keeping every cluster bounded). Stored in √budget
    * form — 2000 rows = 4e6 pairs — and compared as `n <= limit`, the
    * count-form discipline every other pair guard uses: the earlier
    * `n * n <= pairs` form overflows Long past n ≈ 3.04e9 and DISARMS
    * exactly at the 100 TB scale the guard exists for (~2.4e10-row
    * clusters from a 16-way k-means over 4e11 vectors). */
  private val semMaxClusterRows = 2000L

  /** The guard itself, factored out so the spec can hit the regime the
    * fixture can't materialize: n ≈ 3.1e9, where the old product form
    * wrapped negative and passed vacuously. */
  private[graft] def requireClusterWithinSemBudget(n: Long): Unit =
    // √budget comparison, NEVER n*n: the product form wraps negative
    // past n ≈ 3.04e9 and the guard fails open at target scale
    require(n <= semMaxClusterRows,
      s"semdedup: cluster of $n vectors exceeds the " +
        s"$semMaxClusterRows-row (${semMaxClusterRows}²-pair) " +
        "budget — increase k (more, smaller clusters) or use the " +
        "banded path (q_dedup_embedding_lsh) for this corpus")

  /** Within-cluster cosine near-duplicate DROPS: (vec_id, kept_id,
    * cos) — every vector that has a same-cluster neighbor with cosine
    * ≥ `tau` and a LOWER id is dropped; kept_id is its lowest-id such
    * neighbor (the deterministic canonical-survivor rule the dedup
    * family uses everywhere) and cos is the cosine with THAT neighbor,
    * so the row reads as a self-consistent audit record. Exposed for
    * the spec and for pipeline composition (anti-join the corpus
    * against the drops). */
  def semdedupDrops(
      s: SparkSession, d: String, tau: Double = 0.95): DataFrame = {
    val idx = IvfAnn.build(s, d)
    // budget guard: one 16-row aggregate, never a data-sized job
    val sizes = idx.assigned.groupBy(col("cluster")).count()
      .collect().map(r => r.getLong(1))
    sizes.foreach(requireClusterWithinSemBudget)
    // normalized vectors stay array<float>: the codegen'd DotProduct
    // expression is float-typed, and at 0.95-class thresholds float
    // rounding (≤1e-6 on unit vectors) cannot flip a decision
    val nv = idx.assigned
      .withColumn("nrm", SimilarityQueries.l2norm(col("embedding")))
      .select(col("vec_id"), col("cluster"),
        when(col("nrm") > 0,
          transform(col("embedding"),
            x => (x.cast("double") / col("nrm")).cast("float")))
          .otherwise(col("embedding"))
          .as("nv"))
    val a = nv.select(col("cluster"), col("vec_id").as("a_id"),
      col("nv").as("na"))
    val b = nv.select(col("cluster"), col("vec_id").as("b_id"),
      col("nv").as("nb"))
    a.join(b, Seq("cluster"))
      .where(col("a_id") < col("b_id"))
      .withColumn("cos",
        round(SimilarityQueries.dot(col("na"), col("nb")), 6))
      .where(col("cos") >= tau)
      .groupBy(col("b_id").as("vec_id"))
      // cos must be the similarity WITH kept_id (the docstring's audit
      // contract), not the max over all qualifying neighbors — min_by
      // picks the cos of the same row min(a_id) names (a_id is unique
      // within the group, so no tie ambiguity)
      .agg(min(col("a_id")).as("kept_id"),
        min_by(col("cos"), col("a_id")).as("cos"))
  }

  /** Declared query: per-cluster SemDeDup report at τ = 0.95 — cluster
    * size, near-dup pairs surviving the threshold, vectors dropped.
    * Always |clusters| rows (zero-dup clusters included), so the
    * artifact is meaningful even on a dup-free corpus. No oracle (the
    * k-means assignment is engine-internal ML state, like the
    * IVF/PQ/PCA family); SelectionSpec pins the drop semantics on
    * planted duplicates and the budget guard's diagnostic. */
  val qSemdedup: QDef = QDef.noOracle("q_semdedup") { (s, d) =>
    val idx = IvfAnn.build(s, d)
    val drops = semdedupDrops(s, d)
    val clusterOf = idx.assigned.select(col("vec_id"), col("cluster"))
    val perCluster = drops.join(clusterOf, "vec_id")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_dropped"))
    idx.assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"))
      .join(perCluster, Seq("cluster"), "left")
      .select(col("cluster"),
        col("n_vecs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
      .orderBy(col("cluster"))
  }

  /** Shared SQL WITH-chain ending in `alloc(lang, n_tok, alloc_tok,
    * capped)` — the UniMax waterfill both [[qUnimaxAlloc]] and the
    * data-constrained yield report select from. */
  private val unimaxAllocSql: String =
    """WITH lt AS (
      |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |    AS n_tok
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n_tok) // 2 AS BIGINT) AS b,
      |    COUNT(*) AS nl
      |  FROM lt),
      |o AS (
      |  SELECT lang, n_tok,
      |    ROW_NUMBER() OVER (ORDER BY n_tok, lang) AS i,
      |    COALESCE(SUM(4 * n_tok) OVER (ORDER BY n_tok, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum
      |  FROM lt),
      |r AS (
      |  SELECT lang, n_tok, i,
      |    CAST(b - cum AS DOUBLE) / (nl - i + 1) AS share,
      |    CASE WHEN CAST(4 * n_tok AS DOUBLE)
      |      > CAST(b - cum AS DOUBLE) / (nl - i + 1)
      |      THEN 1 ELSE 0 END AS uncapped
      |  FROM o CROSS JOIN tot),
      |kk AS (SELECT MIN(i) AS k FROM r WHERE uncapped = 1),
      |ks AS (SELECT share AS rshare FROM r JOIN kk ON r.i = kk.k),
      |alloc AS (
      |  SELECT lang, n_tok,
      |    CASE WHEN k IS NULL OR i < k
      |      THEN CAST(4 * n_tok AS DOUBLE) ELSE rshare END AS alloc_tok,
      |    CASE WHEN k IS NULL OR i < k THEN 1 ELSE 0 END AS capped
      |  FROM r CROSS JOIN kk LEFT JOIN ks ON TRUE)""".stripMargin

  /** UniMax waterfill frame: (lang, n_tok BIGINT, alloc_tok DOUBLE,
    * capped INT) — the Spark twin of [[unimaxAllocSql]]'s `alloc` CTE,
    * shared with the data-constrained yield report and memoized per
    * (session, sfDir) so the two consumers run the corpus aggregate
    * once (the |langs|-row result persists; the pin survives the
    * harness sweep). alloc_tok is bit-deterministic: either the exact
    * integer 4·n or ONE IEEE divide of exact integers. */
  private def unimaxAlloc(s: SparkSession, d: String): DataFrame =
    graft.sources.SessionCache.getOrElseUpdate(s, ("unimax_alloc", d)) {
      unimaxAllocOf(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private def unimaxAllocOf(s: SparkSession, d: String): DataFrame = {
    val epochs = 4L
    val lt = documents(s, d)
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast("bigint")).as("n_tok"))
    val tot = broadcast(lt.agg(
      expr("CAST(SUM(n_tok) DIV 2 AS BIGINT)").as("b"),
      count(lit(1)).as("nl")))
    val w = Window.orderBy(col("n_tok"), col("lang"))
    val o = lt
      .withColumn("i", row_number().over(w))
      .withColumn("cum", coalesce(
        sum(lit(epochs) * col("n_tok"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val r = o.crossJoin(tot)
      .withColumn("share",
        (col("b") - col("cum")).cast("double")
          / (col("nl") - col("i") + 1))
      .withColumn("uncapped",
        ((lit(epochs) * col("n_tok")).cast("double") > col("share"))
          .cast("int"))
    // the pivot: first uncapped index k and ITS share — min over a
    // |langs|-row frame, broadcast back (k is null when E·n ≤ B/L for
    // every language, i.e. the whole corpus fits the budget capped)
    val kk = broadcast(r.agg(
      min(when(col("uncapped") === 1, col("i"))).as("k"),
      min(when(col("uncapped") === 1,
        struct(col("i"), col("share")))).as("kr")))
    r.crossJoin(kk)
      .select(col("lang"), col("n_tok"),
        when(col("k").isNull || col("i") < col("k"),
          (lit(epochs) * col("n_tok")).cast("double"))
          .otherwise(col("kr").getField("share")).as("alloc_tok"),
        when(col("k").isNull || col("i") < col("k"), 1).otherwise(0)
          .cast("int").as("capped"))
  }

  /** UniMax language-budget allocation (Chung et al., "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023): given per-language token counts, a
    * total training budget B (here: half the corpus) and an epoch cap
    * E = 4, allocate each language min(E·n, fair share) by
    * WATERFILLING — small languages are capped at E epochs, the
    * remaining budget splits equally among the rest. The sequential
    * recurrence has a closed prefix form on languages sorted ascending
    * by size: with cum_i = Σ_{j<i} E·n_j (valid while everything
    * before i is capped) and share_i = (B − cum_i)/(L − i + 1), the
    * FIRST language where E·n_i > share_i starts the uncapped suffix,
    * and every uncapped language gets exactly that share. So the whole
    * allocation is one corpus aggregate to the |langs|-row table, two
    * windows OVER THAT TABLE (bounded by the language domain, never by
    * data volume — whitelisted in RegistryPlanSpec), and a broadcast
    * of the single pivot row.
    *
    * Determinism: n, cum, B and (L − i + 1) are exact integers; share
    * is ONE IEEE divide of exact integers (bit-identical cross-engine)
    * and the cap compare E·n > share sees identical doubles on both
    * sides. */
  val qUnimaxAlloc: QDef = QDef(
    "q_unimax_alloc",
    s"""$unimaxAllocSql
      |SELECT lang, n_tok AS n_tokens,
      |  ROUND(alloc_tok, 4) + 0.0 AS alloc_tokens,
      |  CAST(capped AS INT) AS capped
      |FROM alloc
      |ORDER BY lang""".stripMargin) { (s, d) =>
    unimaxAlloc(s, d)
      .select(col("lang"), col("n_tok").as("n_tokens"),
        (round(col("alloc_tok"), 4) + lit(0.0)).as("alloc_tokens"),
        col("capped"))
      .orderBy(col("lang"))
  }

  /** Data-constrained effective-token yield of the UniMax allocation
    * (Muennighoff et al., "Scaling Data-Constrained Language Models",
    * NeurIPS 2023): repeating data decays in value exponentially —
    * with U unique tokens read for R_D repetitions beyond the first
    * epoch, the paper's fitted form counts D' = U + U·R*·(1 −
    * exp(−R_D/R*)) effective tokens (R* ≈ 15; fitted 15.4 in the
    * paper). This grades each language's UniMax budget: epochs =
    * alloc/U; under one full epoch the yield is just the tokens read
    * (alloc ≤ U reads alloc UNIQUE tokens — the decay law only governs
    * repetition), past it the exponential saturation kicks in, capping
    * any language's possible yield at U·(1 + R*). The report is what a
    * mixing planner reads to see where the next budget dollar still
    * buys effective tokens.
    *
    * Scale + determinism: selects FROM the shared [[unimaxAlloc]]
    * frame (|langs| rows; the corpus work is q_unimax_alloc's one
    * aggregate), epochs is one IEEE divide of bit-identical inputs,
    * and the one libm call exp() micro-quantizes to integer units
    * (floor(e·1e6) — the established ln()/exp() discipline) so every
    * downstream op is correctly-rounded arithmetic on identical
    * doubles. */
  val qDataConstrained: QDef = QDef(
    "q_data_constrained",
    s"""$unimaxAllocSql,
      |ep AS (
      |  SELECT lang, n_tok, alloc_tok, capped,
      |    alloc_tok / n_tok AS epochs
      |  FROM alloc),
      |em AS (
      |  SELECT lang, n_tok, alloc_tok, capped, epochs,
      |    CAST(FLOOR(EXP(-GREATEST(epochs - 1, 0) / 15.0) * 1e6)
      |      AS BIGINT) AS e_micro
      |  FROM ep)
      |SELECT lang, n_tok AS n_tokens,
      |  ROUND(alloc_tok, 4) + 0.0 AS alloc_tokens,
      |  ROUND(epochs, 6) + 0.0 AS epochs,
      |  ROUND(CASE WHEN epochs <= 1 THEN alloc_tok
      |    ELSE n_tok * (1 + 15.0 * (1 - CAST(e_micro AS DOUBLE) / 1e6))
      |    END, 4) + 0.0 AS eff_tokens
      |FROM em
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val rStar = 15.0
    val ep = unimaxAlloc(s, d)
      .withColumn("epochs", col("alloc_tok") / col("n_tok"))
      .withColumn("e_micro",
        floor(exp(-greatest(col("epochs") - 1, lit(0.0)) / lit(rStar))
          * lit(1e6)).cast("bigint"))
    ep.select(col("lang"), col("n_tok").as("n_tokens"),
        (round(col("alloc_tok"), 4) + lit(0.0)).as("alloc_tokens"),
        (round(col("epochs"), 6) + lit(0.0)).as("epochs"),
        (round(when(col("epochs") <= 1, col("alloc_tok"))
          .otherwise(col("n_tok")
            * (lit(1.0) + lit(rStar)
              * (lit(1.0) - col("e_micro").cast("double") / lit(1e6)))),
          4) + lit(0.0)).as("eff_tokens"))
      .orderBy(col("lang"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", LREC 2020): score every document with the corpus's own
    * interpolated-KN bigram model (TextQueries.knDocTotals — the
    * engine's LM-quality primitive) and split the corpus into
    * head/middle/tail TERCILES by per-bigram NLL — head = most fluent
    * third, the slice CCNet keeps for LM training. The report is the
    * 3-row per-bucket summary (doc count, bigram mass, mean NLL) a
    * curation run logs before materializing the head slice.
    *
    * Tercile cuts are VALUES, not row partitions (ties share a
    * bucket): cut_q = min NLL value whose cumulative doc count reaches
    * ⌈qn/3⌉. The cumulative count never runs corpus-wide serial — the
    * q_weighted_median two-level shape: NLL (micro-quantized BIGINT)
    * bands by integer unit, the only unbounded-order window walks the
    * per-band table (≤ ~25 rows — avg bigram NLL is bounded by
    * ln(vocab)), and the per-value window is PARTITIONED by band.
    * Per-doc NLL quantizes as floor((−slp)/n · 1) in micro units: one
    * IEEE divide of exact integers, so cuts and bucket assignment are
    * exact integer compares cross-engine. */
  val qCcnetBuckets: QDef = QDef(
    "q_ccnet_buckets",
    s"""${TextQueries.knDocSql},
      |q AS (
      |  SELECT doc_id, n_bigrams,
      |    CAST(FLOOR(CAST(-slp AS DOUBLE) / n_bigrams) AS BIGINT)
      |      AS nllq
      |  FROM dw),
      |vv AS (SELECT nllq, COUNT(*) AS c FROM q GROUP BY 1),
      |cc AS (
      |  SELECT nllq, SUM(c) OVER (ORDER BY nllq) AS cum FROM vv),
      |nn AS (SELECT COUNT(*) AS n FROM q),
      |cuts AS (
      |  SELECT
      |    (SELECT MIN(nllq) FROM cc, nn WHERE cum >= (n + 2) // 3)
      |      AS cut1,
      |    (SELECT MIN(nllq) FROM cc, nn WHERE cum >= (2 * n + 2) // 3)
      |      AS cut2),
      |bk AS (
      |  SELECT doc_id, n_bigrams, nllq,
      |    CASE WHEN nllq <= cut1 THEN 'head'
      |      WHEN nllq <= cut2 THEN 'middle'
      |      ELSE 'tail' END AS bucket
      |  FROM q CROSS JOIN cuts)
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
      |  ROUND(CAST(SUM(nllq) AS DOUBLE) / COUNT(*) / 1e6, 6) + 0.0
      |    AS avg_nll
      |FROM bk GROUP BY bucket
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    val q = TextQueries.knDocTotals(s, d)
      .select(col("doc_id"), col("n_bigrams"),
        floor((-col("slp")).cast("double") / col("n_bigrams"))
          .cast("bigint").as("nllq"))
    // two-level exact cumulative doc count over the value grain: band
    // by integer NLL unit, offsets from the tiny band table, per-value
    // window partitioned by band
    val vv = q.groupBy(col("nllq")).agg(count(lit(1)).as("c"))
      .withColumn("band", floor(col("nllq") / lit(1e6)).cast("bigint"))
    val offs = vv.groupBy(col("band")).agg(sum(col("c")).as("bc"))
      .withColumn("boff", coalesce(
        sum(col("bc")).over(Window.orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("band"), col("boff"))
    val inner = Window.partitionBy(col("band")).orderBy(col("nllq"))
    val cc = vv.join(broadcast(offs), "band")
      .withColumn("cum", col("boff") + sum(col("c")).over(inner))
    val nn = broadcast(q.agg(count(lit(1)).as("n")))
    // rank thresholds are INTEGER division (⌈n/3⌉ = (n+2) div 3) —
    // Spark's `/` on integers is a double divide, which would shift
    // the cut whenever n+2 is not a multiple of 3
    val cuts = broadcast(cc.crossJoin(nn).agg(
      min(when(col("cum") >= expr("(n + 2) DIV 3"), col("nllq")))
        .as("cut1"),
      min(when(col("cum") >= expr("(2 * n + 2) DIV 3"), col("nllq")))
        .as("cut2")))
    q.crossJoin(cuts)
      .withColumn("bucket",
        when(col("nllq") <= col("cut1"), "head")
          .when(col("nllq") <= col("cut2"), "middle")
          .otherwise("tail"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("n_bigrams")).cast("bigint").as("n_bigrams"),
        (round(sum(col("nllq")).cast("double") / count(lit(1))
          / lit(1e6), 6) + lit(0.0)).as("avg_nll"))
      .orderBy(col("bucket"))
  }

  /** DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining", NeurIPS
    * 2023): one exponentiated-gradient step over per-domain EXCESS
    * loss. The paper's excess is proxy-vs-reference model loss; the
    * engine's stand-in is each source's mean KN bigram NLL minus the
    * corpus-wide mean (clamped at 0) — the same LM-quality primitive
    * CCNet bucketing scores with, so the two reports read off one
    * model. New weight w'_d ∝ u_d · exp(η · excess_d) with the
    * baseline mixture u_d = the source's bigram share and η = 1
    * (a single EG step; iterating is re-running the query on the
    * reweighted sample).
    *
    * Scale shape: the KN totals are the corpus-wide work (bigram hash
    * aggregates + broadcast vocab joins, the q_kneser_ney plan); from
    * there ONE aggregate lands on the |sources|-row table and
    * everything downstream — reference NLL, pivot, normalization — is
    * arithmetic on that bounded frame with 1-row broadcasts. No
    * windows at all.
    *
    * Determinism: per-source NLL micro-units come from an INTEGER
    * divide of exact BIGINTs (DuckDB `//` = Spark `DIV` on positive
    * operands); exp() is quantized to integer micro-units
    * (floor(exp·1e6) — the ln() discipline of q_kneser_ney: a flap
    * needs the true value within 1 ulp of a 1e-6 boundary);
    * numerators n_d · e_micro are exact integer products (HUGEINT /
    * DECIMAL(38,0)), their sum is order-free, and each output weight
    * is ONE IEEE divide of two exactly-known integers. */
  val qDoremiWeights: QDef = QDef(
    "q_doremi_weights",
    s"""${TextQueries.knDocSql},
      |sd AS (SELECT doc_id, source FROM documents),
      |ps AS (
      |  SELECT source, CAST(SUM(n_bigrams) AS BIGINT) AS n_bg,
      |    CAST(SUM(-slp) AS BIGINT) AS nll_sum
      |  FROM dw JOIN sd USING (doc_id)
      |  GROUP BY source),
      |tot AS (
      |  SELECT CAST(SUM(n_bg) AS BIGINT) AS n_all,
      |    CAST(SUM(nll_sum) AS BIGINT) // CAST(SUM(n_bg) AS BIGINT)
      |      AS ref_micro
      |  FROM ps),
      |e AS (
      |  SELECT source, n_bg, n_all,
      |    GREATEST(nll_sum // n_bg - ref_micro, 0) AS excess_micro
      |  FROM ps CROSS JOIN tot),
      |nm AS (
      |  SELECT source, n_bg, n_all, excess_micro,
      |    CAST(n_bg AS HUGEINT)
      |      * CAST(FLOOR(EXP(CAST(excess_micro AS DOUBLE) / 1e6)
      |          * 1e6) AS BIGINT) AS num
      |  FROM e),
      |dn AS (SELECT SUM(num) AS den FROM nm)
      |SELECT source, n_bg AS n_bigrams,
      |  ROUND(CAST(n_bg AS DOUBLE) / CAST(n_all AS DOUBLE), 6) + 0.0
      |    AS token_share,
      |  ROUND(CAST(excess_micro AS DOUBLE) / 1e6, 6) + 0.0
      |    AS excess_nll,
      |  ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0
      |    AS weight
      |FROM nm CROSS JOIN dn
      |ORDER BY source""".stripMargin) { (s, d) =>
    val ps = TextQueries.knDocTotals(s, d)
      .join(documents(s, d).select(col("doc_id"), col("source")),
        "doc_id")
      .groupBy(col("source"))
      .agg(sum(col("n_bigrams")).cast("bigint").as("n_bg"),
        sum(-col("slp")).cast("bigint").as("nll_sum"))
    val tot = broadcast(ps.agg(
      sum(col("n_bg")).cast("bigint").as("n_all"),
      expr("CAST(SUM(nll_sum) AS BIGINT) DIV CAST(SUM(n_bg) AS BIGINT)")
        .as("ref_micro")))
    val nm = ps.crossJoin(tot)
      .withColumn("excess_micro",
        greatest(expr("nll_sum DIV n_bg") - col("ref_micro"), lit(0L)))
      .withColumn("num",
        col("n_bg").cast("decimal(38,0)")
          * floor(exp(col("excess_micro").cast("double") / lit(1e6))
              * lit(1e6)).cast("bigint").cast("decimal(38,0)"))
    val dn = broadcast(nm.agg(sum(col("num")).as("den")))
    nm.crossJoin(dn)
      .select(col("source"), col("n_bg").as("n_bigrams"),
        (round(col("n_bg").cast("double") / col("n_all").cast("double"),
          6) + lit(0.0)).as("token_share"),
        (round(col("excess_micro").cast("double") / lit(1e6), 6)
          + lit(0.0)).as("excess_nll"),
        (round(col("num").cast("double") / col("den").cast("double"),
          6) + lit(0.0)).as("weight"))
      .orderBy(col("source"))
  }

  val defs: Seq[QDef] =
    Seq(qDsirWeights, qDsirSample, qGopherRules, qEmbedDiversity,
      qSemdedup, qUnimaxAlloc, qCcnetBuckets, qDoremiWeights,
      qDataConstrained)
}
