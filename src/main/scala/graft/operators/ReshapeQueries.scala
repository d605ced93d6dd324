package graft.operators

import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Pivot (the Access crosstab TRANSFORM ... PIVOT) and unpivot/melt
  * (SURVEY.md §2.8).
  *
  * Pivot values are always passed explicitly: one aggregation pass, no
  * value-discovery job, deterministic column set — mandatory at scale.
  * The oracle uses portable conditional aggregation (no DuckDB PIVOT
  * dialect).
  */
object ReshapeQueries {

  /** returnflag × linestatus revenue matrix. */
  val qPivot: QDef = QDef(
    "q_pivot",
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
      |    AS DOUBLE) AS status_f,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
      |    AS DOUBLE) AS status_o,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .withColumn("price_dec", col("l_extendedprice").cast("decimal(18,2)"))
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("price_dec")).as("rev"), count(lit(1)).as("cnt"))
      .select(
        col("l_returnflag"),
        // DOUBLE outputs (not DECIMAL): r1 postmortem — DECIMAL renders
        // reader-dependently in the driver hash; this query passed r1
        // only because no sum happened to end in a trailing zero.
        col("F_rev").cast("double").as("status_f"),
        col("O_rev").cast("double").as("status_o"),
        (coalesce(col("F_cnt"), lit(0L)) + coalesce(col("O_cnt"), lit(0L)))
          .as("n_items"))
      .orderBy(col("l_returnflag"))
  }

  /** Inverse crosstab (melt): wide numeric columns → (key, value) rows
    * via `Dataset.unpivot`. */
  val qUnpivot: QDef = QDef(
    "q_unpivot",
    """SELECT * FROM (
      |  SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
      |         l_quantity AS val FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'discount', l_discount
      |  FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
      |) ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, d) =>
    // Range-partition the 1×-wide BASE table, expand, then sort within
    // partitions: the range sample pass and the shuffle move one third
    // of the rows a global post-expansion orderBy would, and the
    // expansion itself runs once instead of twice (orderBy's sampling
    // re-executes its child). Globally correct because range partitions
    // are ordered and non-overlapping with equal keys co-located, and
    // unpivot is narrow (rows stay in their partition) — so the
    // within-partition (key, measure) sort composes to the oracle's
    // total order, including the measure interleaving ACROSS duplicate
    // (l_orderkey, l_linenumber) rows (duplicates share a partition).
    lineitem(s, d)
      .repartitionByRange(col("l_orderkey"), col("l_linenumber"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure",
        "val")
      // unpivot emits the source column names; align with the oracle tags
      .withColumn(
        "measure",
        expr("substring(measure, 3)")) // l_quantity -> quantity
      .sortWithinPartitions(
        col("l_orderkey"), col("l_linenumber"), col("measure"))
  }

  /** Access's crosstab in FULL fidelity: `TRANSFORM Sum(...) PIVOT ...`
    * emits a row-Total column alongside the pivoted value columns —
    * q_pivot covers the matrix, this covers the Total. One aggregation
    * pass produces the status columns AND the row total (the total is
    * the coalesced sum of the pivoted cells, not a second scan);
    * currency accumulates exactly in DECIMAL and renders as DOUBLE
    * (the §0 contract). */
  val qCrosstabTotals: QDef = QDef(
    "q_crosstab_totals",
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
      |    AS DOUBLE) AS status_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
      |    AS DOUBLE) AS status_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
      |    AS DOUBLE) AS status_p,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS row_total,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d)
      .withColumn("price_dec", col("o_totalprice").cast("decimal(18,2)"))
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("price_dec")).as("rev"), count(lit(1)).as("cnt"))
      .select(
        col("o_orderpriority"),
        col("F_rev").cast("double").as("status_f"),
        col("O_rev").cast("double").as("status_o"),
        col("P_rev").cast("double").as("status_p"),
        // the Access Total column: sum of the pivoted cells (exact in
        // DECIMAL before the double rendering)
        (coalesce(col("F_rev"), lit(0).cast("decimal(18,2)"))
          + coalesce(col("O_rev"), lit(0).cast("decimal(18,2)"))
          + coalesce(col("P_rev"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("row_total"),
        (coalesce(col("F_cnt"), lit(0L)) + coalesce(col("O_cnt"), lit(0L))
          + coalesce(col("P_cnt"), lit(0L))).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val defs: Seq[QDef] = Seq(qPivot, qUnpivot, qCrosstabTotals)
}
