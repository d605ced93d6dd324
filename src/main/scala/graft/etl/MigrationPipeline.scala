package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.sources.{JdbcConnector, JetTypes}
import graft.sources.JetTypes.JetType

/** The reference's whole program as a library (SURVEY.md §3.1): an
  * Access-shaped source database → enumerate tables → translate schema
  * → normalize values → bulk-load the target.
  *
  * Where the reference shells out per stage (mdb-tables → mdb-schema →
  * psql → mdb-export → COPY) with text as the only IR, this pipeline is
  * one declarative Spark plan per table: the source read, the
  * `applyJetSchema` normalization, and the sink write fuse into a
  * single distributed job — per-table parallelism comes free from
  * partitioned reads, and at 100 TB each table's load is itself a
  * many-task job rather than one OS process.
  */
object MigrationPipeline {

  /** One table's migration spec: where it comes from, its declared Jet
    * schema (name → type in source ordinal order). */
  final case class TableSpec(
      name: String,
      source: SparkSession => DataFrame,
      jetSchema: Seq[(String, JetType)])

  /** Targets the pipeline can load into. */
  sealed trait Sink
  final case class ParquetSink(baseDir: String) extends Sink
  final case class JdbcSink(url: String) extends Sink

  /** The DDL the schema-translation stage would apply to PostgreSQL —
    * emitted as data (the engine's `mdb-schema` analog). */
  def ddl(spec: TableSpec): String = {
    val cols = spec.jetSchema
      .map { case (n, t) =>
        s"  ${JetTypes.sanitizeName(n)} ${JetTypes.toPostgres(t)}"
      }
      .mkString(",\n")
    s"CREATE TABLE ${JetTypes.sanitizeName(spec.name)} (\n$cols\n);"
  }

  /** Normalize one table: sanitize names + cast Jet encodings. */
  def normalize(spark: SparkSession, spec: TableSpec): DataFrame =
    JetTypes.applyJetSchema(spec.source(spark), spec.jetSchema)

  /** Normalize an ALREADY-TYPED frame — the jetmdb BINARY source
    * yields Jet-correct Spark types directly (Currency is already
    * DECIMAL(19,4), Yes/No already boolean), so re-applying the
    * stringly ingest casts of [[normalize]] would corrupt them (the
    * Currency cast divides by 10⁴ again). Only the name sanitization
    * applies. */
  def normalizeTyped(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(JetTypes.sanitizeName).toIndexedSeq: _*)

  /** Run the full migration; returns per-table row counts.
    * `sinkProps` passes driver/credential options to a JDBC sink. */
  def migrate(
      spark: SparkSession,
      tables: Seq[TableSpec],
      sink: Sink,
      sinkProps: Map[String, String] = Map.empty): Map[String, Long] =
    tables.map { spec =>
      val df = normalize(spark, spec)
      val n = sink match {
        case ParquetSink(dir) =>
          df.write.mode(SaveMode.Overwrite)
            .parquet(s"$dir/${JetTypes.sanitizeName(spec.name)}.parquet")
          spark.read
            .parquet(s"$dir/${JetTypes.sanitizeName(spec.name)}.parquet")
            .count()
        case JdbcSink(url) =>
          val table = JetTypes.sanitizeName(spec.name)
          JdbcConnector.write(
            df, url, table, SaveMode.Overwrite, props = sinkProps)
          // verify the TARGET (like the parquet branch) — counting the
          // source would mask a write that dropped rows
          JdbcConnector.read(spark, url, table, props = sinkProps).count()
      }
      spec.name -> n
    }.toMap
}
