package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.{SessionCache, TableLoader}
import graft.sources.TableLoader._

/** Warehouse-maintenance operators: MERGE-style upsert, referential-
  * integrity audit, partition-pruned scans over a hive-layout table,
  * payload redaction, and training-mix weighting.
  *
  * Scale shapes: the upsert is one full-outer hash join on the key
  * (the MERGE physical plan on any engine); integrity audits are
  * existence joins that never fan out; the partitioned scan proves
  * directory-level pruning (the scan lists ONE priority partition, not
  * the table); redaction and mix weighting are map-side +
  * tiny-aggregate work.
  */
object WarehouseQueries {

  /** MERGE-style snapshot upsert: apply per-customer order spend as a
    * delta onto the customer base table — matched rows update
    * (balance + delta), unmatched base rows keep, delta-only keys
    * insert. One full-outer hash join on the key; both addends
    * accumulate in DECIMAL so the merged balance is exact on both
    * engines. */
  val qMergeUpsert: QDef = QDef(
    "q_merge_upsert",
    """WITH delta AS (
      |  SELECT o_custkey AS k,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS spend
      |  FROM orders GROUP BY o_custkey)
      |SELECT COALESCE(c_custkey, k) AS custkey,
      |  CASE WHEN c_custkey IS NULL THEN 'insert'
      |       WHEN k IS NULL THEN 'keep'
      |       ELSE 'update' END AS action,
      |  CAST(COALESCE(CAST(c_acctbal AS DECIMAL(18,2)),
      |      CAST(0 AS DECIMAL(18,2)))
      |    + COALESCE(CAST(spend AS DECIMAL(18,2)),
      |      CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS new_balance
      |FROM customer FULL OUTER JOIN delta ON c_custkey = k
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val delta = orders(s, d)
      .groupBy(col("o_custkey").as("k"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .as("spend"))
    customer(s, d).select(col("c_custkey"), col("c_acctbal"))
      .join(delta, col("c_custkey") === col("k"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("k")).as("custkey"),
        when(col("c_custkey").isNull, "insert")
          .when(col("k").isNull, "keep")
          .otherwise("update").as("action"),
        (coalesce(col("c_acctbal").cast("decimal(18,2)"),
          lit(0).cast("decimal(18,2)"))
          + coalesce(col("spend").cast("decimal(18,2)"),
            lit(0).cast("decimal(18,2)")))
          .cast("double").as("new_balance"))
      .orderBy(col("custkey"))
  }

  /** Referential-integrity audit across the star schema's FK edges:
    * child row count and orphan count per relation. Orphans come from
    * PK-side existence joins (left join to a DISTINCT key set — never
    * a fanout), and a healthy corpus reports zeros, which is the
    * point: the audit must be cheap enough to run on every load. */
  val qFkIntegrity: QDef = QDef(
    "q_fk_integrity",
    """SELECT fk, n_child, n_orphan FROM (
      |  SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_child,
      |    COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS n_orphan
      |  FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey
      |    FROM orders) o ON l_orderkey = o_orderkey
      |  UNION ALL
      |  SELECT 'orders->customer', COUNT(*),
      |    COUNT(*) FILTER (WHERE c_custkey IS NULL)
      |  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey
      |    FROM customer) c ON o_custkey = c_custkey
      |  UNION ALL
      |  SELECT 'customer->nation', COUNT(*),
      |    COUNT(*) FILTER (WHERE n_nationkey IS NULL)
      |  FROM customer LEFT JOIN (SELECT DISTINCT n_nationkey
      |    FROM nation) n ON c_nationkey = n_nationkey)
      |ORDER BY fk""".stripMargin) { (s, d) =>
    def audit(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame =
      child.select(col(childKey))
        .join(parent.select(col(parentKey)).distinct(),
          col(childKey) === col(parentKey), "left")
        .agg(
          count(lit(1)).as("n_child"),
          count_if(col(parentKey).isNull).as("n_orphan"))
        .select(lit(name).as("fk"), col("n_child"), col("n_orphan"))
    audit("lineitem->orders", lineitem(s, d), "l_orderkey",
        orders(s, d), "o_orderkey")
      .unionAll(audit("orders->customer", orders(s, d), "o_custkey",
        customer(s, d), "c_custkey"))
      .unionAll(audit("customer->nation", customer(s, d), "c_nationkey",
        nation(s, d), "n_nationkey"))
      .orderBy(col("fk"))
  }

  /** Hive-partitioned layout + partition-pruned scan: orders written
    * once per (session, sfDir) under java.io.tmpdir partitioned by
    * o_orderpriority, then read back filtered to ONE priority — the
    * scan lists a single partition directory (directory-level pruning,
    * the 100 TB table-layout contract), which PlanSpec pins via the
    * scan's partitionFilters. The oracle reads the original table with
    * the same predicate, proving the round-trip is lossless. */
  val qScanPartitioned: QDef = QDef(
    "q_scan_partitioned",
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS rev
      |FROM orders
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1
      |ORDER BY month""".stripMargin) { (s, d) =>
    val path = partitionedOrdersPath(s, d)
    s.read.parquet(path)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(to_date(date_trunc("month", col("o_orderdate")))
        .as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("rev"))
      .orderBy(col("month"))
  }

  /** Write (once per session+sfDir) the hive-partitioned orders copy
    * that [[qScanPartitioned]] scans; exposed for PlanSpec. */
  def partitionedOrdersPath(s: SparkSession, d: String): String =
    SessionCache.getOrElseUpdate(s, ("warehouse_part_orders", d)) {
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_part_orders_${math.abs(d.hashCode)}")
      TableLoader.orders(s, d)
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(dir.getAbsolutePath)
      dir.getAbsolutePath
    }

  /** Numeric-payload redaction: mask every digit run in the event
    * props JSON (the PII-scrub shape — same regexp machinery, applied
    * to payloads before sharing). Purely map-side; the aggregate
    * reports masked-run volume per event type. */
  val qPiiMask: QDef = QDef(
    "q_pii_mask",
    """SELECT event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
      |    AS n_masked_runs,
      |  MIN(regexp_replace(props, '[0-9]+', '#', 'g')) AS sample_masked
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0))))
          .as("n_masked_runs"),
        min(regexp_replace(col("props"), "[0-9]+", "#"))
          .as("sample_masked"))
      .orderBy(col("event_type"))
  }

  /** Temperature-scaled training-mix weights: per-language sampling
    * probability ∝ share^0.7 — the multilingual-corpus rebalancing
    * rule. Shares are exact-integer ratios; the 5-term weight
    * normalizer is an order-dependent double sum → ROUND(6). */
  val qTrainMix: QDef = QDef(
    "q_train_mix",
    """WITH s AS (
      |  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      |t AS (SELECT SUM(n) AS tot FROM s),
      |w AS (
      |  SELECT lang, n, n * 1.0 / tot AS share,
      |    power(n * 1.0 / tot, 0.7) AS wgt
      |  FROM s CROSS JOIN t)
      |SELECT lang, n, ROUND(share, 6) AS share,
      |  ROUND(wgt / SUM(wgt) OVER (), 6) AS mix_weight
      |FROM w
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val counts = documents(s, d)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("tot"))
    val share = col("n") * lit(1.0) / col("tot")
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts.crossJoin(tot)
      .withColumn("wgt", pow(share, 0.7))
      .select(
        col("lang"), col("n"),
        round(share, 6).as("share"),
        round(col("wgt") / sum(col("wgt")).over(wAll), 6)
          .as("mix_weight"))
      .orderBy(col("lang"))
  }

  /** Incremental aggregate maintenance: a materialized per-customer
    * order summary (rows before 1997) is brought current by COMBINING
    * it with the delta's partial aggregate — full-outer join on the
    * key, counts add, DECIMAL sums add — instead of rescanning
    * history. The oracle recomputes from scratch over the whole table,
    * so the merge law (partial ⊕ partial = total) is itself what gets
    * hash-verified. At 100 TB this is the nightly-snapshot pattern:
    * the delta is a day, the snapshot never re-reads. */
  val qIncrementalAgg: QDef = QDef(
    "q_incremental_agg",
    """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val o = orders(s, d)
    def partial(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val cut = lit("1997-01-01").cast("timestamp")
    val snapshot = partial(o.filter(col("o_orderdate") < cut))
    val delta = partial(o.filter(col("o_orderdate") >= cut))
    snapshot.as("s")
      .join(delta.as("d"),
        col("s.o_custkey") === col("d.o_custkey"), "full_outer")
      .select(
        coalesce(col("s.o_custkey"), col("d.o_custkey")).as("o_custkey"),
        (coalesce(col("s.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("s.rev"), lit(0).cast("decimal(18,2)"))
          + coalesce(col("d.rev"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .orderBy(col("o_custkey"))
  }

  /** Largest-remainder proration: allocate 10% of each order's value
    * (in integer cents) across its lines proportional to line price, so
    * the per-line integer allocations sum EXACTLY to the order pool —
    * the classic finance/warehouse allocator where naive per-line
    * rounding drifts by a cent per order. floor-share first, then the
    * leftover cents go to the largest fractional remainders
    * (l_linenumber breaks remainder ties totally).
    *
    * Scale shape: three window functions over ONE l_orderkey
    * partitioning — one shuffle, bounded per-order groups (≤ 7 lines).
    * Exactness: the share denominator is an exact DECIMAL window sum
    * (a double window sum would be accumulation-order-dependent); all
    * remaining arithmetic is integer or identical-input double ops,
    * so both engines allocate the same cent to the same line. */
  val qProrateCents: QDef = QDef(
    "q_prorate_cents",
    """WITH l AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(FLOOR(o_totalprice * 10) AS BIGINT) AS pool_cents,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) /
      |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
      |        OVER (PARTITION BY l_orderkey) AS DOUBLE) AS share
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate < TIMESTAMP '1997-02-01'),
      |b AS (
      |  SELECT l_orderkey, l_linenumber, pool_cents,
      |    CAST(FLOOR(pool_cents * share) AS BIGINT) AS base,
      |    pool_cents * share - FLOOR(pool_cents * share) AS rem
      |  FROM l),
      |c AS (
      |  SELECT l_orderkey, l_linenumber, base,
      |    pool_cents - SUM(base) OVER (PARTITION BY l_orderkey)
      |      AS leftover,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |      ORDER BY rem DESC, l_linenumber) AS rk
      |  FROM b)
      |SELECT l_orderkey, l_linenumber,
      |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
      |    AS BIGINT) AS alloc_cents
      |FROM c ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val wp = Window.partitionBy(col("l_orderkey"))
    val wr = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("rem").desc, col("l_linenumber"))
    lineitem(s, d)
      .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-02-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        floor(col("o_totalprice") * 10).cast("bigint").as("pool_cents"),
        col("l_extendedprice").cast("decimal(18,2)").as("price2"))
      .withColumn("share", col("price2").cast("double") /
        sum(col("price2")).over(wp).cast("double"))
      .withColumn("ideal", col("pool_cents") * col("share"))
      .withColumn("base", floor(col("ideal")).cast("bigint"))
      .withColumn("rem", col("ideal") - floor(col("ideal")))
      .withColumn("leftover", col("pool_cents") - sum(col("base")).over(wp))
      .withColumn("rk", row_number().over(wr))
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .cast("bigint").as("alloc_cents"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Z-order (Morton) clustering key over (l_partkey, l_suppkey) and
    * the per-bucket locality profile the layout buys: interleave the
    * low 8 bits of each dimension (bit arithmetic — identical on both
    * engines), bucket by the top 6 of the 16 z-bits, and report each
    * bucket's row count and per-dimension key spread. This is the
    * multi-dimensional file-clustering primitive (Delta/Iceberg
    * OPTIMIZE ZORDER BY): rows in one z-bucket sit in a compact
    * rectangle of (part, supp) space, so min/max file stats prune BOTH
    * predicates — the distinct-count columns make the locality
    * measurable. One projection + one partial+final agg to 64 rows;
    * at scale the same z expression feeds repartitionByRange(z) before
    * the write, which is exactly how the layout is applied. */
  val qZorderKey: QDef = {
    // z = interleave(bits of pk, bits of sk), pk/sk = key & 255;
    // DuckDB spells shifts with operators, Spark SQL with functions
    val duck = (0 until 8).flatMap { b =>
      Seq(s"((((l_partkey & 255) >> $b) & 1) << ${2 * b})",
        s"((((l_suppkey & 255) >> $b) & 1) << ${2 * b + 1})")
    }.mkString(" + ")
    val spk = (0 until 8).flatMap { b =>
      Seq(s"shiftleft(shiftright(l_partkey & 255, $b) & 1, ${2 * b})",
        s"shiftleft(shiftright(l_suppkey & 255, $b) & 1, ${2 * b + 1})")
    }.mkString(" + ")
    QDef(
      "q_zorder_key",
      s"""WITH z AS (
         |  SELECT l_partkey, l_suppkey, ($duck) AS zval
         |  FROM lineitem)
         |SELECT CAST(zval >> 10 AS INT) AS z_bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(DISTINCT l_partkey & 255) AS BIGINT) AS parts_lo,
         |  CAST(COUNT(DISTINCT l_suppkey & 255) AS BIGINT) AS supps_lo
         |FROM z GROUP BY 1
         |ORDER BY z_bucket""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          expr(spk).as("zval"))
        .groupBy(shiftright(col("zval"), 10).cast("int").as("z_bucket"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("l_partkey").bitwiseAND(255)).as("parts_lo"),
          countDistinct(col("l_suppkey").bitwiseAND(255)).as("supps_lo"))
        .orderBy(col("z_bucket"))
    }
  }

  val defs: Seq[QDef] = Seq(
    qMergeUpsert, qFkIntegrity, qScanPartitioned, qPiiMask, qTrainMix,
    qIncrementalAgg, qProrateCents, qZorderKey)
}
