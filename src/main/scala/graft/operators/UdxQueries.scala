package graft.operators

import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** UDF / UDTF surface (SURVEY.md §2.10).
  *
  * A Scala UDF is a Catalyst black box — no pushdown or codegen through
  * it — so the engine treats UDFs as a last-resort extension point; the
  * oracle uses the closed SQL form. Generators (one row → many) ride
  * the built-in `posexplode`.
  */
object UdxQueries {

  /** Scalar Scala UDF: parse "1-URGENT" → priority rank int. */
  val qUdfScalar: QDef = QDef(
    "q_udf_scalar",
    """SELECT o_orderkey,
      |  CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_rank
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val prioRank = udf((p: String) => p.substring(0, 1).toInt)
    orders(s, d)
      .select(
        col("o_orderkey"),
        prioRank(col("o_orderpriority")).as("prio_rank"))
      .orderBy(col("o_orderkey"))
  }

  /** Generator/UDTF: posexplode over split priority ("1-URGENT" →
    * [(1,"1"),(2,"URGENT")]). Spark's posexplode is 0-based; +1 aligns
    * with SQL ordinality. */
  val qUdtfExplode: QDef = QDef(
    "q_udtf_explode",
    """SELECT * FROM (
      |  SELECT o_orderkey, 1 AS pos,
      |         split_part(o_orderpriority, '-', 1) AS tok FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 2 AS pos,
      |         split_part(o_orderpriority, '-', 2) AS tok FROM orders
      |) ORDER BY o_orderkey, pos""".stripMargin) { (s, d) =>
    orders(s, d)
      .select(
        col("o_orderkey"),
        posexplode(split(col("o_orderpriority"), "-")).as(Seq("pos0", "tok")))
      .select(
        col("o_orderkey"), (col("pos0") + 1).cast("int").as("pos"),
        col("tok"))
      .orderBy(col("o_orderkey"), col("pos"))
  }

  /** OUTER generator semantics: posexplode_outer keeps rows whose
    * array is NULL (here: negative-balance customers) with NULL
    * pos/seg, where plain explode would drop them — the generator
    * twin of LEFT JOIN vs JOIN. Oracle rebuilds both branches with a
    * UNION ALL (DuckDB unnest drops NULLs like the inner form). */
  val qExplodeOuter: QDef = QDef(
    "q_explode_outer",
    """WITH a AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_acctbal < 0 THEN NULL
      |      ELSE string_split(c_name, '#') END AS segs
      |  FROM customer)
      |SELECT c_custkey, CAST(NULL AS INT) AS pos,
      |  CAST(NULL AS VARCHAR) AS seg
      |FROM a WHERE segs IS NULL
      |UNION ALL
      |SELECT c_custkey,
      |  CAST(generate_subscripts(segs, 1) - 1 AS INT) AS pos,
      |  unnest(segs) AS seg
      |FROM a WHERE segs IS NOT NULL
      |ORDER BY c_custkey, pos""".stripMargin) { (s, d) =>
    customer(s, d)
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0, lit(null))
          .otherwise(split(col("c_name"), "#")).as("segs"))
      .select(col("c_custkey"),
        posexplode_outer(col("segs")).as(Seq("pos", "seg")))
      .orderBy(col("c_custkey"), col("pos"))
  }

  val defs: Seq[QDef] = Seq(qUdfScalar, qUdtfExplode, qExplodeOuter)
}
