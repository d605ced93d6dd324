package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.sources.{JdbcConnector, JetTypes}
import graft.sources.JetTypes.JetType
import graft.sources.jetmdb.JetMdbFormat.JetIndex
import graft.sources.jetmdb.JetMdbSource.JetRelationshipRow

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
    * schema (name → type in source ordinal order), and the indexes its
    * TDEF declares (primary key / unique / plain — the post-load
    * constraint surface; empty for an index-less source). */
  final case class TableSpec(
      name: String,
      source: SparkSession => DataFrame,
      jetSchema: Seq[(String, JetType)],
      indexes: Seq[JetIndex] = Nil)

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

  /** The POST-LOAD constraints stage (the lifecycle step after bulk
    * load in §3.1's own diagram — constraints go on AFTER the data so
    * the load itself is unconstrained bulk I/O): primary keys,
    * secondary indexes, and foreign keys as executable DDL, in
    * dependency order (every PK/unique before any FK that references
    * it — an FK target must already have its unique backing).
    *
    * Dialect: `postgres` (default) emits the full surface; `derby`
    * suppresses `ON UPDATE CASCADE` (Derby has no update-cascade
    * action — the FK still goes on, with the default NO ACTION), which
    * is what lets the E2E spec drive the whole stage against the
    * embedded Derby this environment has.
    *
    * Un-enforced Access relationships (dbRelationDontEnforce) emit no
    * constraint — Access itself does not check them — and surface as
    * a SQL comment so the migrated schema documents their existence.
    * Multi-column relationships regroup their per-column
    * MSysRelationships rows by name, icolumn-ordered. */
  def constraintDdl(
      specs: Seq[TableSpec],
      relationships: Seq[JetRelationshipRow] = Nil,
      dialect: String = "postgres"): Seq[String] = {
    require(dialect == "postgres" || dialect == "derby",
      s"constraintDdl: unknown dialect '$dialect'")
    def san(n: String): String = JetTypes.sanitizeName(n)
    // COLUMN identifiers are double-quoted: the Spark JDBC writer this
    // stage follows CREATEs columns as quoted case-exact identifiers
    // (see JdbcConnector.upsert's matching note), and Derby's unquoted
    // upper-folding would otherwise miss them. Table names stay
    // verbatim — the writer passes dbtable through unquoted, so both
    // sides fold identically.
    def qc(n: String): String = "\"" + san(n) + "\""
    val pks = specs.flatMap { spec =>
      spec.indexes.filter(_.primary).flatMap { ix =>
        val t = san(spec.name)
        // Derby does not null-out PK columns implicitly (Postgres
        // does): the NOT NULL alters must precede the constraint
        val notNulls =
          if (dialect == "derby")
            ix.columns.map(c =>
              s"ALTER TABLE $t ALTER COLUMN ${qc(c)} NOT NULL")
          else Nil
        notNulls :+
          (s"ALTER TABLE $t ADD CONSTRAINT ${t}_pkey PRIMARY KEY " +
            ix.columns.map(qc).mkString("(", ", ", ")"))
      }
    }
    val secondary = specs.flatMap { spec =>
      spec.indexes.filterNot(_.primary).map { ix =>
        val t = san(spec.name)
        val unique = if (ix.unique) "UNIQUE " else ""
        s"CREATE ${unique}INDEX idx_${t}_${san(ix.name)} ON $t " +
          ix.columns.map(qc).mkString("(", ", ", ")")
      }
    }
    val fks = relationships.groupBy(_.name).toSeq.sortBy(_._1)
      .map { case (relName, rows) =>
        val ordered = rows.sortBy(_.icolumn)
        val head = ordered.head
        require(ordered.map(_.icolumn) == (0 until ordered.size),
          s"constraintDdl: relationship '$relName' has gaps in its " +
            s"column list (icolumn ${ordered.map(_.icolumn)})")
        val child = san(head.table)
        val parent = san(head.refTable)
        if (!head.enforced)
          s"-- relationship ${san(relName)}: $child" +
            ordered.map(r => san(r.column)).mkString("(", ", ", ")") +
            s" -> $parent" +
            ordered.map(r => san(r.refColumn)).mkString("(", ", ", ")") +
            " not enforced in Access (dbRelationDontEnforce); no " +
            "constraint emitted"
        else {
          val onDelete =
            if (head.deleteCascade) " ON DELETE CASCADE" else ""
          val onUpdate =
            if (head.updateCascade && dialect == "postgres")
              " ON UPDATE CASCADE"
            else ""
          s"ALTER TABLE $child ADD CONSTRAINT fk_${san(relName)} " +
            "FOREIGN KEY " +
            ordered.map(r => qc(r.column)).mkString("(", ", ", ")") +
            s" REFERENCES $parent " +
            ordered.map(r => qc(r.refColumn)).mkString("(", ", ", ")") +
            onDelete + onUpdate
        }
      }
    pks ++ secondary ++ fks
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
    * `sinkProps` passes driver/credential options to a JDBC sink.
    * After ALL tables load into a JDBC sink, the constraints stage
    * applies [[constraintDdl]] (PKs/indexes from each spec,
    * `relationships` as FKs) — after, because bulk load into a
    * constrained table pays per-row checking and FK targets may load
    * later than their children. Parquet sinks carry no constraints;
    * the DDL is still available via [[constraintDdl]] for the
    * warehouse that will mount them. */
  def migrate(
      spark: SparkSession,
      tables: Seq[TableSpec],
      sink: Sink,
      sinkProps: Map[String, String] = Map.empty,
      relationships: Seq[JetRelationshipRow] = Nil): Map[String, Long] = {
    val counts = tables.map { spec =>
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
    sink match {
      case JdbcSink(url) =>
        val dialect =
          if (url.startsWith("jdbc:derby")) "derby" else "postgres"
        val ddl = constraintDdl(tables, relationships, dialect)
          .filterNot(_.startsWith("--")) // comments document, not execute
        JdbcConnector.execute(url, ddl, sinkProps)
      case _: ParquetSink => () // no constraint surface on files
    }
    counts
  }
}
