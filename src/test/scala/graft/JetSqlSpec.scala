package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JetSql.translate

/** Jet-SQL → ANSI translation: every rewrite the translator claims,
  * its quoting discipline, and the honest rejections. The translated
  * output EXECUTING correctly sits under the driver hash gate as
  * q_jetsql_saved. */
class JetSqlSpec extends AnyFunSuite {

  test("bracketed identifiers sanitize like the migration does") {
    assert(translate("SELECT [Order ID], [2nd Col] FROM [Order Log]") ==
      "SELECT order_id, c_2nd_col FROM order_log")
  }

  test("double-quoted strings become single-quoted with escapes") {
    assert(translate("SELECT \"it's \"\"x\"\"\" FROM t") ==
      "SELECT 'it''s \"x\"' FROM t")
  }

  test("date literals: Jet US order and ISO, date and timestamp") {
    assert(translate("WHERE d >= #1/31/2024#") ==
      "WHERE d >= DATE '2024-01-31'")
    assert(translate("WHERE d >= #2024-01-31#") ==
      "WHERE d >= DATE '2024-01-31'")
    assert(translate("WHERE t < #12/25/2023 14:30#") ==
      "WHERE t < TIMESTAMP '2023-12-25 14:30:00'")
  }

  test("IIF nests; NZ 2-arg translates; NZ 1-arg rejects") {
    assert(translate("SELECT IIf(a > 1, IIf(b = 2, x, y), Nz(c, 0))") ==
      "SELECT CASE WHEN a > 1 THEN CASE WHEN b = 2 THEN x ELSE y END " +
        "ELSE COALESCE(c, 0) END")
    val e = intercept[IllegalArgumentException] {
      translate("SELECT Nz(a) FROM t")
    }
    assert(e.getMessage.contains("context-dependent"))
  }

  test("TOP n floats to a trailing LIMIT; TOP PERCENT rejects with " +
    "the operator pointer") {
    assert(translate("SELECT TOP 5 a FROM t ORDER BY a") ==
      "SELECT a FROM t ORDER BY a LIMIT 5")
    val e = intercept[IllegalArgumentException] {
      translate("SELECT TOP 10 PERCENT a FROM t ORDER BY a")
    }
    assert(e.getMessage.contains("q_jet_top_percent"))
  }

  test("concat operator, LIKE wildcards (only inside the pattern), " +
    "function renames, cast functions") {
    assert(translate(
      "SELECT a & \"-\" & b WHERE nm LIKE \"Sm*th?\"") ==
      "SELECT a || '-' || b WHERE nm LIKE 'Sm%th_'")
    // a * outside LIKE stays multiplication; a * inside an ordinary
    // string stays a star
    assert(translate("""SELECT a * 2, "lit*eral" FROM t""") ==
      "SELECT a * 2, 'lit*eral' FROM t")
    assert(translate("SELECT UCase(Mid(nm, 2, 3)), Len(nm), " +
      "CDbl(qty), CLng(qty), Now(), Date()") ==
      "SELECT upper(substr(nm, 2, 3)), length(nm), " +
        "CAST(qty AS DOUBLE), CAST(BROUND(qty) AS BIGINT), " +
        "current_timestamp, current_date")
    // CLng is Access banker's rounding, not a truncating cast:
    // CLng(2.5) = 2, CLng(3.5) = 4 — BROUND matches both
    val spark = TestSpark.session
    val r = spark.sql(translate("SELECT CLng(2.5) AS a, CLng(3.5) AS b"))
      .collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
  }

  test("multi-space runs inside string literals survive (spacing is " +
    "token-level, never a regex over the output)") {
    assert(translate("SELECT \"two  spaces   here\" FROM t") ==
      "SELECT 'two  spaces   here' FROM t")
  }

  test("a column merely NAMED [Top] is not the TOP keyword") {
    assert(translate("SELECT [Top], a FROM t WHERE [Top] > 3") ==
      "SELECT top, a FROM t WHERE top > 3")
  }

  test("untranslatable constructs reject loudly, never silently wrong") {
    for (bad <- Seq(
      "TRANSFORM Sum(x) SELECT a FROM t PIVOT b",
      "SELECT Format(d, 'yyyy') FROM t",
      "SELECT DLookUp('x', 't') FROM u")) {
      val e = intercept[IllegalArgumentException] { translate(bad) }
      assert(e.getMessage.contains("jetsql:"), s"$bad → ${e.getMessage}")
    }
  }

  test("a full translated saved query runs in Spark and matches the " +
    "direct DataFrame form") {
    val spark = TestSpark.session
    graft.sources.TableLoader.orders(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("orders")
    val jet = Seq(
      "SELECT TOP 7 [o_orderkey],",
      "  UCase([o_orderstatus]) & \"/\" &",
      "    IIf([o_totalprice] > 200000, \"BIG\", \"small\") AS tag",
      "FROM orders",
      "WHERE [o_orderdate] >= #1/1/1995# " +
        "AND [o_orderpriority] LIKE \"1-*\"",
      "ORDER BY [o_orderkey]").mkString("\n")
    val got = spark.sql(graft.sources.JetSql.translate(jet)).collect()
    import org.apache.spark.sql.functions._
    val want = graft.sources.TableLoader
      .orders(spark, "/root/testdata/sf0.001")
      .where(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
        col("o_orderpriority").startsWith("1-"))
      .select(col("o_orderkey"),
        concat(upper(col("o_orderstatus")), lit("/"),
          when(col("o_totalprice") > 200000, "BIG")
            .otherwise("small")).as("tag"))
      .orderBy(col("o_orderkey")).limit(7).collect()
    assert(got.toSeq == want.toSeq)
  }
}
