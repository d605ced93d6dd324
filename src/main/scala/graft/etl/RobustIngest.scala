package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Malformed-record policies for text-format ingest (CSV/JSON) — the
  * part of a migration tool that decides what happens when the source
  * export contains rows that do not match the declared schema (truncated
  * lines, wrong arity, bad numerics: all routine in mdb-export-style
  * dumps).
  *
  * Three policies, mapping directly onto Spark's parser modes:
  *   - [[quarantine]] (PERMISSIVE + corrupt-record column): every row
  *     survives; broken ones carry their raw text in a quarantine column
  *     for later repair — the right default for audited migrations.
  *   - [[dropMalformed]]: silently discard broken rows — for pipelines
  *     where partial loss is acceptable and throughput matters.
  *   - [[failFast]]: abort on the first broken row — for loads that must
  *     be all-or-nothing.
  *
  * All three are schema-first (explicit StructType, §1.2 discipline) and
  * scale-neutral: the policy is enforced inside the distributed parser,
  * no driver-side row handling.
  */
object RobustIngest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))

  /** PERMISSIVE read: good rows parse, bad rows land whole in
    * [[CorruptCol]]. Returns the full frame; use [[splitQuarantine]] to
    * separate.
    *
    * The returned frame is CACHED (see below) and the caller owns its
    * lifetime: `unpersist()` it after the clean/quarantined splits have
    * been consumed, or a long session ingesting many files accumulates
    * cached partitions without bound. */
  def quarantine(
      spark: SparkSession, schema: StructType, fmt: String,
      path: String): DataFrame = {
    val r = spark.read.schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    val df = fmt match {
      case "csv" => r.option("header", "true").csv(path)
      case "json" => r.json(path)
      case other => throw new IllegalArgumentException(
        s"unsupported format: $other")
    }
    // Required: Spark disallows queries whose referenced columns are
    // ONLY the corrupt-record column over raw text sources
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — caching
    // the parsed result is the documented pattern, and quarantined
    // frames are read at least twice (clean split + repair audit).
    df.cache()
  }

  /** (clean rows with the declared schema, quarantined raw records). */
  def splitQuarantine(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col(CorruptCol).isNull).drop(CorruptCol),
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol)))

  /** Discard malformed rows inside the parser.
    *
    * Caveat (Spark semantics): malformedness is judged against the
    * REFERENCED columns — a query that prunes every column (e.g. a bare
    * COUNT(*)) parses nothing and drops nothing. Consumers that read
    * all declared columns get the expected dropping behavior. */
  def dropMalformed(
      spark: SparkSession, schema: StructType, fmt: String,
      path: String): DataFrame = {
    val r = spark.read.schema(schema).option("mode", "DROPMALFORMED")
    fmt match {
      case "csv" => r.option("header", "true").csv(path)
      case "json" => r.json(path)
      case other => throw new IllegalArgumentException(
        s"unsupported format: $other")
    }
  }

  /** Abort the job on the first malformed row. */
  def failFast(
      spark: SparkSession, schema: StructType, fmt: String,
      path: String): DataFrame = {
    val r = spark.read.schema(schema).option("mode", "FAILFAST")
    fmt match {
      case "csv" => r.option("header", "true").csv(path)
      case "json" => r.json(path)
      case other => throw new IllegalArgumentException(
        s"unsupported format: $other")
    }
  }
}
