package graft.operators

import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** TPC-H pack 2: the remaining benchmark shapes adaptable to this
  * dataset (no partsupp table, no l_commitdate/l_receiptdate/
  * l_shipmode, so Q9/Q11/Q12/Q16/Q20/Q21 are re-expressed on the
  * columns that exist — each keeps its original's OPERATOR shape,
  * which is what the pack exists to exercise):
  *
  *  - Q6  single-scan filter aggregate (pure pushdown),
  *  - Q8  8-table star with a conditional-share aggregate,
  *  - Q9  profit rollup by nation x year with a LIKE part filter,
  *  - Q11 group-over-threshold from a global scalar aggregate,
  *  - Q12 conditional counts by class after a date-windowed join,
  *  - Q15 view + MAX scalar subquery (top supplier, ties kept),
  *  - Q16 count-distinct with a NOT-IN (anti join) exclusion,
  *  - Q21 sole-late-supplier in multi-supplier orders.
  *
  * Scale shapes: every date/brand/type filter pushes into its scan;
  * nation/region/supplier dims broadcast; Q21 is deliberately the
  * single-shuffle aggregate formulation (per-(order,supplier) flags,
  * then per-order counts) rather than the textbook double
  * EXISTS/NOT EXISTS self-join of lineitem — same result, one
  * shuffle on l_orderkey instead of two extra fact-fact joins.
  *
  * Float determinism: money terms follow the repo contract — per-row
  * double product cast to DECIMAL(18,4), exact decimal SUM, final
  * CAST to DOUBLE (QDef scaladoc). Ratio outputs divide two
  * exact-derived doubles and ROUND for the rendering seam only.
  */
object BenchmarkQueries2 {

  private val volume =
    (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")

  /** TPC-H Q6 (forecast revenue change): one scan, three pushed
    * predicates, no join, no group — the pushdown/codegen floor of
    * the pack. Discount bounds compare the SAME parquet doubles in
    * both engines, so the boundary rows agree bit-for-bit. */
  val qTpchQ6: QDef = QDef(
    "q_tpch_q6",
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
  }

  /** TPC-H Q8 (national market share): NATION_5's share of ASIA's
    * PROMO-part revenue per order year. The widest join in the repo
    * (lineitem + 7 dims); every dim is broadcast-sized, customer
    * nation and supplier nation join the SAME dim twice under
    * different aliases, and the share is a conditional sum over one
    * aggregate pass — no second scan for the denominator. */
  val qTpchQ8: QDef = QDef(
    "q_tpch_q8",
    """WITH rev AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
      |      AS volume,
      |    sn.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation cn ON cn.n_nationkey = c_nationkey
      |  JOIN region ON r_regionkey = cn.n_regionkey
      |  JOIN nation sn ON sn.n_nationkey = s_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT o_year,
      |  ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
      |FROM rev GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
    val cn = nation(s, d).select(col("n_nationkey").as("cn_key"),
      col("n_regionkey").as("cn_region"))
    val sn = nation(s, d).select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    lineitem(s, d)
      .join(part(s, d).filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(cn, col("c_nationkey") === col("cn_key"))
      .join(region(s, d).filter(col("r_name") === "ASIA"),
        col("cn_region") === col("r_regionkey"))
      .join(sn, col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_5", volume)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
        sum(volume).cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 (product-type profit), adapted: no partsupp, so the
    * cost leg is a retail-price proxy (p_retailprice * l_quantity *
    * 0.1) — same double product in both engines, cast to exact
    * DECIMAL before the sum so the profit aggregate stays
    * order-independent. LIKE filter prunes the part dim BEFORE its
    * join; grouped by supplier nation x order year. */
  val qTpchQ9: QDef = QDef(
    "q_tpch_q9",
    """SELECT sn.n_name AS nation,
      |  CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(SUM(
      |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
      |    - CAST(p_retailprice * l_quantity * 0.1 AS DECIMAL(18,4)))
      |    AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN nation sn ON sn.n_nationkey = s_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY sn.n_name, CAST(year(o_orderdate) AS INT)
      |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .join(part(s, d).filter(col("p_name").like("%widget%")),
        col("l_partkey") === col("p_partkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(sum(
        volume - (col("p_retailprice") * col("l_quantity") * lit(0.1))
          .cast("decimal(18,4)")).cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 (important stock), adapted to revenue concentration:
    * parts whose lifetime revenue exceeds 1.5× the AVERAGE per-part
    * revenue. The threshold is a one-row global aggregate broadcast
    * into the per-part HAVING — the textbook scalar-subquery-over-a-
    * view shape. SCALE-FREE fraction (r12): the r11 fixed 0.2%-of-
    * total threshold returned 0 rows at EVERY fixture scale (part
    * count grows with SF, so any fixed fraction eventually empties —
    * the same flaw the real TPC-H spec fixes by dividing its fraction
    * by SF), making the hash gate empty-vs-empty vacuous. 1.5/count
    * tracks the spec's intent and yields 2/29/252 rows at
    * sf0.001/0.01/0.1. Both sides compare in DOUBLE (exact-decimal
    * derived), so the boundary is the same bit pattern in both
    * engines. */
  val qTpchQ11: QDef = QDef(
    "q_tpch_q11",
    """WITH pr AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(18,4))) AS DOUBLE) AS part_value
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT l_partkey, part_value
      |FROM pr, (SELECT SUM(part_value) AS t, COUNT(*) AS c FROM pr)
      |WHERE part_value > t * (1.5 / c)
      |ORDER BY part_value DESC, l_partkey""".stripMargin) { (s, d) =>
    val pr = lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(volume).cast("double").as("part_value"))
    val tot = pr.agg(sum(col("part_value")).as("t"),
      count(lit(1)).as("c"))
    pr.crossJoin(broadcast(tot))
      .filter(col("part_value") > col("t") * (lit(1.5) / col("c")))
      .select(col("l_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** TPC-H Q12 (shipping-mode priority), adapted: no l_shipmode /
    * l_receiptdate, so the class axis is the ship-lag bucket (>30
    * days late vs on time) and the measure splits URGENT+HIGH
    * priority lines from the rest — Q12's conditional-count-by-class
    * shape on the columns that exist. */
  val qTpchQ12: QDef = QDef(
    "q_tpch_q12",
    """SELECT
      |  CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
      |    THEN 'late' ELSE 'ontime' END AS ship_class,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    orders(s, d)
      .join(lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "late").otherwise("ontime").as("ship_class"))
      .agg(
        sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(high, 0).otherwise(1)).as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  /** TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    * the max (ties preserved — the MAX scalar subquery, not a LIMIT 1,
    * exactly like the spec). The revenue view is computed once and
    * reused for both the threshold and the probe. */
  val qTpchQ15: QDef = QDef(
    "q_tpch_q15",
    """WITH srev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN srev ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM srev)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val srev = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(volume).cast("double").as("total_revenue"))
    val mx = srev.agg(max(col("total_revenue")).as("mx"))
    supplier(s, d)
      .join(srev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(mx), col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16 (parts/supplier relationship), adapted: distinct
    * supplier count per (brand, size) for three brands, EXCLUDING
    * below-threshold-balance suppliers via the spec's NOT IN — an
    * anti join against a tiny filtered dim, never a broadcast of the
    * fact side. */
  val qTpchQ16: QDef = QDef(
    "q_tpch_q16",
    """SELECT p_brand, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM part JOIN lineitem ON l_partkey = p_partkey
      |WHERE p_brand IN ('Brand#7', 'Brand#13', 'Brand#20')
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin) { (s, d) =>
    part(s, d)
      .filter(col("p_brand").isin("Brand#7", "Brand#13", "Brand#20"))
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .join(supplier(s, d).filter(col("s_acctbal") < 2000)
          .select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted to
    * ship-lag lateness: suppliers who were the ONLY late supplier on
    * a finished multi-supplier order. Formulated as one aggregation
    * over (order, supplier) lateness flags + one per-order rollup —
    * the textbook EXISTS + NOT EXISTS double self-join of lineitem
    * computes the same set with two extra fact-fact shuffles, which
    * is exactly what a 100 TB plan cannot afford. MAX(CASE…suppkey)
    * is safe as "the" late supplier because rows with nlate <> 1 are
    * discarded. */
  val qTpchQ21: QDef = QDef(
    "q_tpch_q21",
    """WITH per AS (
      |  SELECT l_orderkey, l_suppkey,
      |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
      |      THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY l_orderkey, l_suppkey),
      |ord AS (
      |  SELECT l_orderkey, COUNT(*) AS nsupp, SUM(late) AS nlate,
      |    MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      |  FROM per GROUP BY l_orderkey)
      |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM ord JOIN supplier ON s_suppkey = late_supp
      |WHERE nsupp >= 2 AND nlate = 1
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin) { (s, d) =>
    val late = when(
      col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"), 1)
      .otherwise(0)
    val per = lineitem(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(late).as("late"))
    per.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("nsupp"), sum(col("late")).as("nlate"),
        max(when(col("late") === 1, col("l_suppkey"))).as("late_supp"))
      .filter(col("nsupp") >= 2 && col("nlate") === 1)
      .join(supplier(s, d), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** TPC-H Q2 (minimum-cost supplier), adapted: no partsupp, so
    * supply cost is the shipped unit cost per (part, supplier) —
    * integer micro-dollars via the exact half-up division
    * (20000·pc + qc) // (2·qc), the same integer-ordering rule as
    * q_argmin_supplier. Eligibility (EUROPE region) restricts the
    * min BEFORE it is taken, exactly like the spec's correlated
    * subquery over region-filtered suppliers; cost ties keep ALL
    * minimal suppliers (the spec's semantics — q_argmin_supplier's
    * packed form deliberately keeps one). */
  val qTpchQ2: QDef = QDef(
    "q_tpch_q2",
    """WITH cost AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |    (20000 * SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * 100 AS BIGINT))
      |      + SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
      |        * 100 AS BIGINT)))
      |    // (2 * SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
      |        * 100 AS BIGINT))) AS uc
      |  FROM lineitem GROUP BY 1, 2),
      |eligible AS (
      |  SELECT s_suppkey FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |mc AS (
      |  SELECT pk, MIN(uc) AS m FROM cost
      |  JOIN eligible ON sk = s_suppkey GROUP BY pk)
      |SELECT s.s_name, n.n_name, c.pk AS p_partkey, p.p_name,
      |  c.uc / 1000000.0 AS unit_cost
      |FROM cost c
      |JOIN mc ON c.pk = mc.pk AND c.uc = mc.m
      |JOIN eligible e ON c.sk = e.s_suppkey
      |JOIN supplier s ON c.sk = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN part p ON c.pk = p.p_partkey
      |WHERE p.p_size <= 25
      |ORDER BY unit_cost DESC, p_partkey, s.s_name
      |LIMIT 100""".stripMargin) { (s, d) =>
    val cost = lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("bigint").as("p100"),
        (col("l_quantity").cast("decimal(18,2)") * 100)
          .cast("bigint").as("q100"))
      .groupBy(col("pk"), col("sk"))
      .agg(expr(
        "(20000 * sum(p100) + sum(q100)) div (2 * sum(q100))").as("uc"))
    val eligible = supplier(s, d)
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(region(s, d).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey").as("esk"))
    // eCost's two consumers (per-part min + the min-match join back)
    // each re-run the (pk, sk) final aggregate + semi join above the
    // reused lineitem shuffle (r14 opt: plans/r14/q_tpch_q2_*.txt).
    // The grain is ~8x smaller than the fact table, so materializing
    // it once and feeding both consumers is the scale-correct shape
    // (1.58 s -> ~1.1 s at sf0.1).
    // r15 re-adjudication (the r14 driver number was steal-contaminated,
    // verdict item 2): clean paired A/B at n=8, same host, same hour —
    // WITH localCheckpoint 1.50 s vs WITHOUT 1.84 s. The checkpoint
    // stays.
    val eCost = cost.join(eligible, col("sk") === col("esk"), "left_semi")
      .localCheckpoint()
    val mc = eCost.groupBy(col("pk").as("mpk")).agg(min(col("uc")).as("m"))
    eCost
      .join(mc, col("pk") === col("mpk") && col("uc") === col("m"))
      .join(supplier(s, d), col("sk") === col("s_suppkey"))
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(part(s, d).filter(col("p_size") <= 25),
        col("pk") === col("p_partkey"))
      .select(col("s_name"), col("n_name"), col("pk").as("p_partkey"),
        col("p_name"), (col("uc") / lit(1000000.0)).as("unit_cost"))
      .orderBy(col("unit_cost").desc, col("p_partkey"), col("s_name"))
      .limit(100)
  }

  /** TPC-H Q7 (bilateral volume shipping): revenue between one pair
    * of nations in either direction, by ship year — the disjunctive
    * cross-dimension predicate (supplier nation, customer nation)
    * cannot push into either dim alone, but Catalyst derives
    * n_name IN (…) on both nation dims before the join. */
  val qTpchQ7: QDef = QDef(
    "q_tpch_q7",
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation sn ON sn.n_nationkey = s_nationkey
      |JOIN nation cn ON cn.n_nationkey = c_nationkey
      |WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
      |    OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3'))
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    val sn = nation(s, d).select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    val cn = nation(s, d).select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"))
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(sn, col("sn_key") === col("s_nationkey"))
      .join(cn, col("cn_key") === col("c_nationkey"))
      .filter(
        (col("supp_nation") === "NATION_3" &&
          col("cust_nation") === "NATION_8") ||
        (col("supp_nation") === "NATION_8" &&
          col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(sum(volume).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q20 (excess-stock suppliers), adapted: suppliers holding
    * more than HALF a widget part's 1997 shipped volume — the spec's
    * nested-IN chain becomes agg → per-part rollup → integer-exact
    * share threshold (2·q > tq, no division) → SEMI join into the
    * supplier dim. */
  val qTpchQ20: QDef = QDef(
    "q_tpch_q20",
    """WITH ps AS (
      |  SELECT l_suppkey, l_partkey,
      |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS q
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%widget%'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1, 2),
      |pt AS (SELECT l_partkey AS pk2, SUM(q) AS tq FROM ps GROUP BY 1)
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM ps JOIN pt ON l_partkey = pk2
      |  WHERE 2 * q > tq)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val ps = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(part(s, d).filter(col("p_name").like("%widget%")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_suppkey"), col("l_partkey"),
        (col("l_quantity").cast("decimal(18,2)") * 100)
          .cast("bigint").as("q100"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("q100")).as("q"))
    val pt = ps.groupBy(col("l_partkey").as("pk2")).agg(sum(col("q")).as("tq"))
    val hoarders = ps.join(pt, col("l_partkey") === col("pk2"))
      .filter(lit(2) * col("q") > col("tq"))
      .select(col("l_suppkey"))
    supplier(s, d)
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(hoarders, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  val defs: Seq[QDef] = Seq(
    qTpchQ6, qTpchQ8, qTpchQ9, qTpchQ11, qTpchQ12, qTpchQ15,
    qTpchQ16, qTpchQ21, qTpchQ2, qTpchQ7, qTpchQ20)
}
