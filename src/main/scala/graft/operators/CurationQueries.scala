package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Corpus-curation and reporting operators: prefix-hash dedup,
  * percentile length-band filtering, Zipf head inspection, SCD-2 run
  * history, Pareto concentration, RFM segmentation, and
  * month-over-month deltas.
  *
  * Scale shapes: dedup and filtering stay at document grain with one
  * hash-partitioned aggregate each; rank-bearing reports (Zipf,
  * Pareto) TOP-K FIRST and only then apply the unpartitioned window,
  * so the serial stage sees k rows regardless of corpus size; SCD-2
  * runs one window per entity partition; RFM computes its quartiles
  * with a banded two-level prefix sum (exact NTILE semantics, no
  * unpartitioned window over the customer grain — customers scale
  * with the data, so a global NTILE sort would serialize the whole
  * dimension through one task).
  */
object CurationQueries {

  /** Prefix-hash near-dup pass: documents sharing the md5 of their
    * first 120 chars form one group; the smallest doc_id is the
    * keeper. The Common-Crawl-style cheap first pass before MinHash —
    * one hash, one groupBy, one join back; no pairwise work. */
  val qDedupPrefix: QDef = QDef(
    "q_dedup_prefix",
    """WITH p AS (
      |  SELECT doc_id, md5(substr(text, 1, 120)) AS ph
      |  FROM documents),
      |g AS (
      |  SELECT ph, MIN(doc_id) AS keeper, COUNT(*) AS group_size
      |  FROM p GROUP BY ph)
      |SELECT p.doc_id, g.group_size, p.doc_id = g.keeper AS is_kept
      |FROM p JOIN g USING (ph)
      |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
    val p = documents(s, d)
      .select(col("doc_id"), md5(substring(col("text"), 1, 120)).as("ph"))
    val g = p.groupBy(col("ph"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("group_size"))
    p.join(g, "ph")
      .select(col("doc_id"), col("group_size"),
        (col("doc_id") === col("keeper")).as("is_kept"))
      .orderBy(col("doc_id"))
  }

  /** Percentile length-band quality filter: global p05/p95 of n_chars
    * (a 1-row aggregate that broadcast-joins onto the corpus), then
    * per-language kept/dropped counts — the "drop the too-short and
    * too-long tails" curation staple, with the cutoffs in the output
    * so the report is self-describing. */
  val qLengthBand: QDef = QDef(
    "q_length_band",
    """WITH b AS (
      |  SELECT quantile_cont(n_chars, 0.05) AS lo,
      |    quantile_cont(n_chars, 0.95) AS hi
      |  FROM documents)
      |SELECT lang,
      |  COUNT(*) FILTER (WHERE n_chars >= lo AND n_chars <= hi)
      |    AS n_kept,
      |  COUNT(*) FILTER (WHERE n_chars < lo OR n_chars > hi)
      |    AS n_dropped,
      |  ROUND(lo, 4) AS p05_chars, ROUND(hi, 4) AS p95_chars
      |FROM documents CROSS JOIN b
      |GROUP BY lang, lo, hi
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = documents(s, d).select(col("lang"), col("n_chars"))
    val bands = docs.agg(
      percentile(col("n_chars"), lit(0.05)).as("lo"),
      percentile(col("n_chars"), lit(0.95)).as("hi"))
    val inBand = col("n_chars") >= col("lo") && col("n_chars") <= col("hi")
    docs.crossJoin(bands)
      .groupBy(col("lang"), col("lo"), col("hi"))
      .agg(
        count_if(inBand).as("n_kept"),
        count_if(!inBand).as("n_dropped"))
      .select(col("lang"), col("n_kept"), col("n_dropped"),
        round(col("lo"), 4).as("p05_chars"),
        round(col("hi"), 4).as("p95_chars"))
      .orderBy(col("lang"))
  }

  /** Zipf head: top-50 tokens with rank and cumulative token-mass
    * share. Top-k FIRST (a distributed sort-limit), THEN the rank and
    * running-share window over exactly 50 rows — the serial window
    * never sees vocabulary cardinality. The running numerator is an
    * exact integer sum; the share divides two exact integers. */
  val qZipfTop: QDef = QDef(
    "q_zipf_top",
    """WITH f AS (
      |  SELECT w, COUNT(*) AS c
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  GROUP BY w),
      |tot AS (SELECT SUM(c) AS total_tokens FROM f),
      |top AS (SELECT w, c FROM f ORDER BY c DESC, w LIMIT 50)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT)
      |    AS rank,
      |  w, c,
      |  CAST(SUM(c) OVER (ORDER BY c DESC, w
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / total_tokens AS cum_share
      |FROM top CROSS JOIN tot
      |ORDER BY rank""".stripMargin) { (s, d) =>
    val f = documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = f.agg(sum(col("c")).as("total_tokens"))
    val top = f.orderBy(col("c").desc, col("w")).limit(50)
    val ord = Window.orderBy(col("c").desc, col("w"))
    val run = Window.orderBy(col("c").desc, col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(tot)
      .select(
        row_number().over(ord).cast("long").as("rank"),
        col("w"), col("c"),
        (sum(col("c")).over(run).cast("double") / col("total_tokens"))
          .as("cum_share"))
      .orderBy(col("rank"))
  }

  /** SCD-2-style run history: per customer, maximal runs of identical
    * order status in (date, orderkey) order, each with its validity
    * interval — the change-tracking shape a warehouse derives from
    * ordered facts. Run ids come from a running integer sum over a
    * change flag (exact, hash-safe); one window + one aggregate, both
    * partitioned by the entity key. */
  val qScd2Status: QDef = QDef(
    "q_scd2_status",
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(o_orderdate AS DATE) AS d, o_orderstatus,
      |    LAG(o_orderstatus) OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev
      |  FROM orders),
      |g AS (
      |  SELECT o_custkey, d, o_orderstatus,
      |    CAST(SUM(CASE WHEN prev IS NULL OR prev <> o_orderstatus
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS run_id
      |  FROM o)
      |SELECT o_custkey, run_id, o_orderstatus AS status,
      |  MIN(d) AS valid_from, MAX(d) AS valid_to,
      |  COUNT(*) AS n_orders
      |FROM g
      |GROUP BY o_custkey, run_id, o_orderstatus
      |ORDER BY o_custkey, run_id""".stripMargin) { (s, d) =>
    val wLag = Window.partitionBy(col("o_custkey"))
      .orderBy(col("d"), col("o_orderkey"))
    val wRun = Window.partitionBy(col("o_custkey"))
      .orderBy(col("d"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"), col("o_orderstatus"))
      .withColumn("prev", lag(col("o_orderstatus"), 1).over(wLag))
      .withColumn("run_id",
        sum(when(col("prev").isNull
          || col("prev") =!= col("o_orderstatus"), 1).otherwise(0))
          .over(wRun).cast("long"))
      .groupBy(col("o_custkey"), col("run_id"), col("o_orderstatus"))
      .agg(
        min(col("d")).as("valid_from"),
        max(col("d")).as("valid_to"),
        count(lit(1)).as("n_orders"))
      .select(col("o_custkey"), col("run_id"),
        col("o_orderstatus").as("status"),
        col("valid_from"), col("valid_to"), col("n_orders"))
      .orderBy(col("o_custkey"), col("run_id"))
  }

  /** Pareto concentration report: top-200 parts by revenue with
    * cumulative revenue share against the WHOLE corpus total. Like
    * Zipf: top-k first, window over 200 rows only; the global total
    * comes from a separate 1-row decimal-exact aggregate. The
    * cumulative sum re-accumulates in DECIMAL (part revenue is exact
    * at scale 4) so the running values are association-free. */
  val qParetoRevenue: QDef = QDef(
    "q_pareto_revenue",
    """WITH pr AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(18,4))) AS DOUBLE) AS rev
      |  FROM lineitem GROUP BY l_partkey),
      |t AS (SELECT CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE)
      |    AS total_rev FROM pr),
      |top AS (SELECT l_partkey, rev FROM pr
      |        ORDER BY rev DESC, l_partkey LIMIT 200)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey)
      |    AS BIGINT) AS rank,
      |  l_partkey, rev,
      |  CAST(SUM(CAST(rev AS DECIMAL(18,4))) OVER
      |    (ORDER BY rev DESC, l_partkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) / total_rev AS cum_share
      |FROM top CROSS JOIN t
      |ORDER BY rank""".stripMargin) { (s, d) =>
    val pr = lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("rev"))
    val t = pr.agg(sum(col("rev").cast("decimal(18,4)")).cast("double")
      .as("total_rev"))
    val top = pr.orderBy(col("rev").desc, col("l_partkey")).limit(200)
    val ord = Window.orderBy(col("rev").desc, col("l_partkey"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(t)
      .select(
        row_number().over(ord).cast("long").as("rank"),
        col("l_partkey"), col("rev"),
        (sum(col("rev").cast("decimal(18,4)")).over(run).cast("double")
          / col("total_rev")).as("cum_share"))
      .orderBy(col("rank"))
  }

  /** Adds an exact NTILE(4)-equivalent quartile column WITHOUT a
    * global single-partition window (the q_weighted_median /
    * q_shard_pack two-level prefix-sum shape): rows band by a monotone
    * function of the metric (ties always share a band, so banding never
    * splits a tie group), per-band counts get exclusive prefix offsets
    * via a window over the BOUNDED band table (≤ a few dozen rows), and
    * the within-band row_number runs PARTITIONED BY band. rank =
    * band offset + within-band row number reproduces the NTILE total
    * order (metric direction, custkey tiebreak) exactly; the quartile
    * then falls out of NTILE's closed-form bucket sizes: with n rows
    * the first n%4 buckets hold floor(n/4)+1 rows, the rest floor(n/4).
    */
  private def addNtile4(
      df: DataFrame,
      metric: Column,
      descending: Boolean,
      band: Column,
      out: String): DataFrame = {
    val b = df.withColumn("__band", band)
    val bandOrd = if (descending) col("__band").desc else col("__band").asc
    val offs = b.groupBy(col("__band"))
      .agg(count(lit(1)).as("__bn"))
      .select(
        col("__band"),
        coalesce(
          sum(col("__bn")).over(Window.orderBy(bandOrd)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("__boff"),
        sum(col("__bn")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)).as("__n"))
    val innerOrd =
      if (descending) Seq(metric.desc, col("o_custkey").asc)
      else Seq(metric.asc, col("o_custkey").asc)
    val rk = col("__boff") +
      row_number().over(
        Window.partitionBy(col("__band")).orderBy(innerOrd: _*))
    // closed-form NTILE(4) from (rank, n); when n < 4 the first branch
    // always applies (cut = n ≥ rank), so the base-0 division in the
    // otherwise-branch is never evaluated (CaseWhen is lazy)
    val base = floor(col("__n") / 4)
    val rem = col("__n") % 4
    val cut = rem * (base + lit(1))
    val quartile = when(rk <= cut, floor((rk - lit(1)) / (base + lit(1))) + lit(1))
      .otherwise(rem + floor((rk - cut - lit(1)) / base) + lit(1))
    b.join(broadcast(offs), "__band")
      .withColumn(out, quartile.cast("int"))
      .drop("__band", "__boff", "__n")
  }

  /** RFM segmentation: per-customer recency (days from last order to
    * the corpus max date), frequency, monetary, each cut into NTILE(4)
    * quartiles with custkey tie-breaks (deterministic total orders).
    * The facts aggregate to customer grain FIRST; each quartile cut is
    * the banded exact-rank formulation above — identical output to the
    * oracle's NTILE, but every customer-grain window is partitioned
    * (band widths are fixed-domain constants here; at extreme
    * dimension sizes they would come from approx-percentile sampling,
    * same contract). */
  val qRfmSegments: QDef = QDef(
    "q_rfm_segments",
    """WITH a AS (
      |  SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
      |c AS (
      |  SELECT o_custkey,
      |    CAST(datediff('day', MAX(CAST(o_orderdate AS DATE)), anchor)
      |      AS INT) AS recency_days,
      |    COUNT(*) AS frequency,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS monetary
      |  FROM orders CROSS JOIN a
      |  GROUP BY o_custkey, anchor)
      |SELECT o_custkey, recency_days, frequency, monetary,
      |  CAST(NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS INT)
      |    AS r_quartile,
      |  CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT)
      |    AS f_quartile,
      |  CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT)
      |    AS m_quartile
      |FROM c
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val anchor = orders(s, d)
      .agg(max(to_date(col("o_orderdate"))).as("anchor"))
    val c = orders(s, d).crossJoin(anchor)
      .groupBy(col("o_custkey"), col("anchor"))
      .agg(
        datediff(col("anchor"), max(to_date(col("o_orderdate"))))
          .cast("int").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("monetary"))
    // materialize the customer-grain aggregate ONCE (the pagerank /
    // label_prop multi-consumer discipline): six downstream branches
    // (3 band-offset tables + 3 rank joins) would otherwise each
    // re-aggregate the fact table, and each cut joins its slim
    // (custkey, quartile) result back rather than chaining so no
    // branch re-derives another's windows
    val cm = c.localCheckpoint()
    val slim = (q: DataFrame, n: String) => q.select(col("o_custkey"), col(n))
    val r = slim(addNtile4(cm, col("recency_days"), descending = false,
      floor(col("recency_days") / 64).cast("int"), "r_quartile"), "r_quartile")
    val f = slim(addNtile4(cm, col("frequency"), descending = true,
      col("frequency").cast("int"), "f_quartile"), "f_quartile")
    val m = slim(addNtile4(cm, col("monetary"), descending = true,
      floor(col("monetary") / 100000).cast("int"), "m_quartile"), "m_quartile")
    cm.join(r, "o_custkey").join(f, "o_custkey").join(m, "o_custkey")
      .select(
        col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_quartile"), col("f_quartile"),
        col("m_quartile"))
      .orderBy(col("o_custkey"))
  }

  /** Month-over-month revenue deltas: calendar-bounded monthly rollup
    * (decimal-exact sums), then LAG and an exact-IEEE relative change —
    * no rounding needed because both operands are identical
    * decimal-derived doubles on both engines. */
  val qMomChange: QDef = QDef(
    "q_mom_change",
    """WITH m AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS rev,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT month, rev, n_orders,
      |  LAG(rev) OVER (ORDER BY month) AS prev_rev,
      |  (rev - LAG(rev) OVER (ORDER BY month))
      |    / LAG(rev) OVER (ORDER BY month) AS mom_pct
      |FROM m
      |ORDER BY month""".stripMargin) { (s, d) =>
    val w = Window.orderBy(col("month"))
    orders(s, d)
      .groupBy(to_date(date_trunc("month", col("o_orderdate")))
        .as("month"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("rev"),
        count(lit(1)).as("n_orders"))
      .select(
        col("month"), col("rev"), col("n_orders"),
        lag(col("rev"), 1).over(w).as("prev_rev"),
        ((col("rev") - lag(col("rev"), 1).over(w))
          / lag(col("rev"), 1).over(w)).as("mom_pct"))
      .orderBy(col("month"))
  }

  /** Winsorized per-nation account-balance mean: global p05/p95
    * cutoffs (exact interpolated percentiles, same cross-engine family
    * q_robust_stats relies on) broadcast back, every balance CLIPPED
    * into [lo, hi], then a plain grouped mean + clip-rate report — the
    * outlier-robust complement of q_length_band's drop-the-tails
    * filter (clipping keeps the row, capping its influence). Two
    * passes, summaries broadcast between; never a global sort.
    */
  val qWinsorize: QDef = QDef(
    "q_winsorize",
    """WITH c AS (
      |  SELECT quantile_cont(c_acctbal, 0.05) AS lo,
      |         quantile_cont(c_acctbal, 0.95) AS hi
      |  FROM customer)
      |SELECT c_nationkey,
      |  ROUND(AVG(LEAST(GREATEST(c_acctbal, lo), hi)), 2) AS wmean,
      |  COUNT(*) AS n_cust,
      |  ROUND(AVG(CASE WHEN c_acctbal < lo OR c_acctbal > hi
      |    THEN 1.0 ELSE 0.0 END), 4) AS clip_rate
      |FROM customer, c
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    val cust = customer(s, d)
    val cuts = cust.agg(
      expr("percentile(c_acctbal, 0.05)").as("lo"),
      expr("percentile(c_acctbal, 0.95)").as("hi"))
    val clipped =
      least(greatest(col("c_acctbal"), col("lo")), col("hi"))
    cust.crossJoin(broadcast(cuts))
      .groupBy(col("c_nationkey"))
      .agg(
        round(avg(clipped), 2).as("wmean"),
        count(lit(1)).as("n_cust"),
        round(avg(when(col("c_acctbal") < col("lo")
          || col("c_acctbal") > col("hi"), 1.0).otherwise(0.0)), 4)
          .as("clip_rate"))
      .orderBy(col("c_nationkey"))
  }

  /** Train→test contamination check: share of each TEST document's
    * distinct word 5-grams that appear anywhere in the TRAIN split
    * (the q_split_hash content-hash assignment, so the split is
    * reproducible cross-engine). The canonical eval-integrity gate
    * before training on a scraped corpus.
    *
    * Shape: tokenize → positional 5-gram md5s (one explode, grams
    * hashed to fixed-width strings so the join key is narrow) →
    * per-side DISTINCT → LEFT join test-grams against the
    * dedup-reduced train set → per-doc counts. At 100 TB the train
    * side is the big one: it reduces to DISTINCT hashes (shuffle on
    * the hash — uniform by construction, no skew), and the probe is a
    * plain hash join a bloom pre-filter could thin further; nothing
    * here is quadratic in corpus size. */
  val qContamination: QDef = {
    val bucketSql = "CAST(('0x' || substr(md5(text), 1, 4)) AS INT) % 100"
    QDef(
      "q_contamination",
      s"""WITH s AS (
         |  SELECT doc_id, $bucketSql AS b,
         |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |      x -> x <> '') AS toks
         |  FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, b,
         |    md5(array_to_string(toks[i:i+4], ' ')) AS h
         |  FROM s, UNNEST(generate_series(1, len(toks) - 4)) AS u(i)
         |  WHERE len(toks) >= 5),
         |tr AS (SELECT DISTINCT h FROM g WHERE b < 90),
         |te AS (SELECT doc_id, h FROM g WHERE b >= 95)
         |SELECT te.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(SUM(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  ROUND(CAST(SUM(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / COUNT(*), 6) AS contamination
         |FROM te LEFT JOIN tr ON te.h = tr.h
         |GROUP BY te.doc_id
         |ORDER BY contamination DESC, te.doc_id
         |LIMIT 20""".stripMargin) { (s, d) =>
      val bucket =
        (graft.functions.Md5HexSlice(col("text").cast("binary"), 1, 4)
          .cast("int") % 100).cast("int")
      val g = documents(s, d)
        .select(col("doc_id"), bucket.as("b"),
          expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')")
            .as("toks"))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"), col("b"),
          explode(expr(
            """transform(sequence(1, size(toks) - 4),
              |  i -> md5(concat_ws(' ', slice(toks, i, 5))))"""
              .stripMargin)).as("h"))
        .distinct()
      val tr = g.filter(col("b") < 90).select(col("h")).distinct()
      val te = g.filter(col("b") >= 95)
        .select(col("doc_id"), col("h").as("th"))
      te.join(tr, col("th") === col("h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("h").isNotNull, 1).otherwise(0)).as("n_hit"),
          round(sum(when(col("h").isNotNull, 1).otherwise(0))
            .cast("double") / count(lit(1)), 6).as("contamination"))
        .orderBy(col("contamination").desc, col("doc_id"))
        .limit(20)
    }
  }

  /** Cluster-representative selection — the step AFTER a dedup pass
    * groups documents: each cluster keeps its highest-QUALITY member
    * (longest text, doc_id as the deterministic tiebreak), not merely
    * the lowest id the cheap passes use. The grain here is the
    * md5 of the first-8-word shingle (coarser than q_dedup_prefix's
    * 120-char key, so real multi-member clusters form), and the output
    * is the per-cluster AUDIT a curation run logs: the surviving doc,
    * member count, total bytes, and bytes reclaimed by collapsing the
    * cluster to its representative.
    *
    * Scale shape: ONE hash-partitioned aggregate at cluster grain —
    * the keeper is an `min_by` over the composite ordering key
    * (−n_chars, doc_id), so no window sort and no per-cluster row
    * traffic beyond the aggregate's partial buffers. The oracle
    * expresses the same policy as a partitioned ROW_NUMBER, pinning
    * that the argmin-by-struct really implements "max quality, min id
    * on ties" cross-engine. */
  val qDedupClusterRep: QDef = QDef(
    "q_dedup_cluster_rep",
    """WITH p AS (
      |  SELECT doc_id, n_chars,
      |    md5(array_to_string(string_split(text, ' ')[1:8], ' '))
      |      AS ck
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY ck
      |      ORDER BY n_chars DESC, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY ck) AS n_members,
      |    SUM(n_chars) OVER (PARTITION BY ck) AS total_chars
      |  FROM p)
      |SELECT doc_id AS rep_doc_id,
      |  CAST(n_members AS BIGINT) AS n_members,
      |  CAST(total_chars AS BIGINT) AS total_chars,
      |  CAST(total_chars - n_chars AS BIGINT) AS chars_saved
      |FROM r WHERE rn = 1
      |ORDER BY rep_doc_id""".stripMargin) { (s, d) =>
    val p = documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8))
          .cast("binary")).as("ck"))
    p.groupBy(col("ck"))
      .agg(count(lit(1)).cast("bigint").as("n_members"),
        sum(col("n_chars")).cast("bigint").as("total_chars"),
        min_by(struct(col("doc_id"), col("n_chars")),
          struct((-col("n_chars")).as("neg_q"), col("doc_id")))
          .as("rep"))
      .select(col("rep.doc_id").as("rep_doc_id"), col("n_members"),
        col("total_chars"),
        (col("total_chars") - col("rep.n_chars")).as("chars_saved"))
      .orderBy(col("rep_doc_id"))
  }

  val defs: Seq[QDef] = Seq(
    qDedupPrefix, qLengthBand, qZipfTop, qScd2Status, qParetoRevenue,
    qRfmSegments, qMomChange, qWinsorize, qContamination,
    qDedupClusterRep)
}
