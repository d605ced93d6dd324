package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator: a Spark query plus (optionally) the equivalent
  * DuckDB oracle SQL the driver hash-compares against (SURVEY.md §2).
  *
  * Determinism contract every QDef must satisfy (SURVEY.md §0):
  *   - total ORDER BY (key tie-breakers) on both sides;
  *   - ROUND every floating-point output on both sides;
  *   - identical column names (explicit aliases) and aligned types
  *     (integer sums CAST to BIGINT in the oracle — DuckDB SUM(INTEGER)
  *     is HUGEINT); NEVER a DECIMAL output column — the driver hashes
  *     renderings, which differ per reader: accumulate in DECIMAL,
  *     emit DOUBLE on both sides;
  *   - no nondeterministic operators (dropDuplicates row-picks, bare
  *     first/last, rand, monotonically_increasing_id);
  *   - any ROUNDed column whose value can be a tiny NEGATIVE number
  *     must fold negative zero with `+ 0.0` on BOTH sides: ROUND of
  *     (-ε) yields -0.0 in DuckDB but +0.0 in Spark's HALF_UP, and
  *     the driver hashes the rendering ("-0.0" ≠ "0.0").
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  /** Oracle-checked query. */
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(oracle))

  /** Declared-only query (non-SQL-expressible op: HLL, LSH, streaming). */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, None)
}
