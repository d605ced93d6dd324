package graft.operators

import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Aggregation operators (SURVEY.md §2.4).
  *
  * All groupings compile to `HashAggregateExec` with a map-side partial
  * phase, so at cluster scale only one shuffle of partially-aggregated
  * rows crosses the wire per query — the shape that survives 100 TB.
  */
object AggQueries {

  /** Flagship: TPC-H Q1 pricing summary (multi-key group, SUM/AVG/COUNT).
    * Partial aggregation reduces ~6 B lineitem rows (100 TB scale) to
    * |flags|x|status| rows per task before the single shuffle.
    */
  val qAggBasic: QDef = QDef(
    "q_agg_basic",
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
      |  ROUND(AVG(l_discount), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val defs: Seq[QDef] = Seq(qAggBasic)
}
