package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QDef
import graft.sources.TableLoader._

/** Core-ETL operators — the reference's own migration surface
  * (SURVEY.md §2.1): schema introspection, the normalize transform,
  * currency-exact decimal aggregation, and text-format ingest
  * round-trips (CSV was the mdbtools intermediate format).
  */
object EtlQueries {

  /** Schema extraction as data (`mdb-schema` analog): ordinal + name. */
  val qSchemaIntrospect: QDef = QDef(
    "q_schema_introspect",
    """SELECT CAST(row_number() OVER () AS INT) AS ordinal, column_name
      |FROM (DESCRIBE SELECT * FROM lineitem)
      |ORDER BY ordinal""".stripMargin) { (s, d) =>
    val fields = lineitem(s, d).schema.fieldNames.zipWithIndex
      .map { case (n, i) => (i + 1, n) }
    s.createDataFrame(fields.toSeq).toDF("ordinal", "column_name")
      .orderBy(col("ordinal"))
  }

  /** The migration transform in one query: sanitize column names, cast
    * types, default nulls, derive a Yes/No flag — the DataFrame half of
    * "JDBC source/sink + DataFrame transformations". */
  val qEtlNormalize: QDef = QDef(
    "q_etl_normalize",
    """SELECT c_custkey AS customer_id,
      |  CAST(c_nationkey AS BIGINT) AS nation_id,
      |  COALESCE(NULLIF(TRIM(c_name), ''), 'UNKNOWN') AS customer_name,
      |  CAST(CAST(ROUND(COALESCE(c_acctbal, 0.0), 2) AS DECIMAL(19,4))
      |    AS DOUBLE) AS balance,
      |  (c_acctbal > 0) AS is_active,
      |  LOWER(c_mktsegment) AS segment
      |FROM customer
      |ORDER BY customer_id""".stripMargin) { (s, d) =>
    customer(s, d)
      .select(
        col("c_custkey").as("customer_id"),
        col("c_nationkey").cast("bigint").as("nation_id"),
        coalesce(nullif(trim(col("c_name")), lit("")), lit("UNKNOWN"))
          .as("customer_name"),
        // Currency semantics live in the DECIMAL(19,4) cast (the §1.2
        // Access-Currency mapping); the trailing DOUBLE cast is output-
        // rendering only (driver-hash parity — see qAggBasic).
        round(coalesce(col("c_acctbal"), lit(0.0)), 2)
          .cast("decimal(19,4)").cast("double").as("balance"),
        (col("c_acctbal") > 0).as("is_active"),
        lower(col("c_mktsegment")).as("segment"))
      .orderBy(col("customer_id"))
  }

  /** Currency-exact aggregation: Access Currency → DecimalType(19,4)
    * accumulation (exact, order-independent); final value emitted as
    * DOUBLE on both engines (correctly-rounded conversion → identical
    * bits; DECIMAL outputs fail the driver's rendering-sensitive hash).
    */
  val qCastDecimal: QDef = QDef(
    "q_cast_decimal",
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)))
      |    AS DOUBLE) AS total_currency
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(19,4)"))
          .cast("double").as("total_currency"))
      .orderBy(col("l_returnflag"))
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Export documents metadata to a temp dir in the given format for
    * the ingest round-trip queries. Always re-exported (never reuses a
    * marker from an earlier JVM): the export is cheap at fixture scale
    * and a stale cache would silently serve outdated rows if the source
    * parquet were regenerated in place. Within one JVM the export is
    * memoized per (session, sfDir, fmt). */
  private def roundtripDir(
      s: org.apache.spark.sql.SparkSession, d: String, fmt: String)
      : String =
    graft.sources.SessionCache.getOrElseUpdate(s, ("ingest", d, fmt)) {
      val out = s"/tmp/graft_ingest_${fmt}_${d.hashCode.toHexString}"
      val src = documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val w = src.coalesce(1).write.mode("overwrite")
      if (fmt == "csv") w.option("header", "true").csv(out)
      else if (fmt == "orc") w.orc(out)
      else if (fmt == "xml")
        // Access's own XML export shape: <dataroot> root, one element
        // per row named after the table
        w.option("rootTag", "dataroot").option("rowTag", "documents")
          .format("xml").save(out)
      else w.json(out)
      out
    }

  /** CSV ingest with explicit schema (the mdbtools intermediate format):
    * export → re-read → must equal the source table, so the oracle reads
    * the original parquet. */
  val qScanCsv: QDef = QDef(
    "q_scan_csv",
    """SELECT doc_id, lang, source, n_chars FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    s.read.schema(docSchema).option("header", "true")
      .csv(roundtripDir(s, d, "csv"))
      .orderBy(col("doc_id"))
  }

  /** JSON-lines ingest with explicit schema — same round-trip
    * contract. */
  val qScanJson: QDef = QDef(
    "q_scan_json",
    """SELECT doc_id, lang, source, n_chars FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    s.read.schema(docSchema).json(roundtripDir(s, d, "json"))
      .orderBy(col("doc_id"))
  }

  /** ORC ingest (the second columnar lake format Spark ships a native
    * vectorized reader for) — same export → re-read → must-equal-source
    * contract; the oracle reads the original parquet since DuckDB has
    * no ORC reader. */
  val qScanOrc: QDef = QDef(
    "q_scan_orc",
    """SELECT doc_id, lang, source, n_chars FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    s.read.schema(docSchema).orc(roundtripDir(s, d, "orc"))
      .orderBy(col("doc_id"))
  }

  /** XML ingest (Spark 4's built-in XML datasource) in Microsoft
    * Access's OWN export shape — `<dataroot>` root element, one
    * `<documents>` element per row — the third interchange format the
    * reference's source system emits next to CSV and the .mdb binary.
    * Same export → re-read → must-equal-source contract; the oracle
    * reads the original parquet. */
  val qScanXml: QDef = QDef(
    "q_scan_xml",
    """SELECT doc_id, lang, source, n_chars FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    s.read.schema(docSchema).option("rowTag", "documents")
      .format("xml").load(roundtripDir(s, d, "xml"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Ingest through the jetcsv DataSource V2 (the custom Access-export
    * source: schema.jet sidecar + CSV part files, column pruning +
    * reader-side filter skipping — JetCsvSourceSpec pins those): export
    * → re-read through `format("jetcsv")` → must equal the source
    * table. doc_id/n_chars ride Jet LongInteger (int32 — Jet has no
    * 64-bit integer), so the oracle casts to INT too. */
  val qScanJetCsv: QDef = QDef(
    "q_scan_jetcsv",
    """SELECT CAST(doc_id AS INT) AS doc_id, lang, source,
      |  CAST(n_chars AS INT) AS n_chars FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val dir = graft.sources.SessionCache
      .getOrElseUpdate(s, ("ingest", d, "jetcsv")) {
        val out = s"/tmp/graft_ingest_jetcsv_${d.hashCode.toHexString}"
        documents(s, d)
          .select(col("doc_id").cast("int"), col("lang"),
            col("source"), col("n_chars").cast("int"))
          .coalesce(1).write.mode("overwrite")
          .option("header", "false").csv(out)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(out, "schema.jet"),
          "doc_id:long\nlang:text\nsource:text\nn_chars:long\n")
        out
      }
    s.read.format("jetcsv").load(dir).orderBy("doc_id")
  }

  /** Ingest through the jetmdb BINARY DataSource V2 (the Jet4 `.mdb`
    * page-format reader/writer — JetMdbSourceSpec pins the layout
    * against independent fixtures): export documents to a real Jet4
    * database file, re-read through `format("jetmdb")`, must equal
    * the source table. Same int32 cast rule as jetcsv (Jet has no
    * 64-bit integer). This makes the binary source oracle-checked
    * end-to-end, not just spec-covered. */
  val qScanJetMdb: QDef = QDef(
    "q_scan_jetmdb",
    """SELECT CAST(doc_id AS INT) AS doc_id, lang, source,
      |  CAST(n_chars AS INT) AS n_chars,
      |  CAST(CAST(n_chars * 1.25 AS DECIMAL(15,2)) AS DOUBLE) AS amount
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    jetRoundtrip(s, d, "jetmdb", ".mdb", None, Seq(
      col("doc_id").cast("int").as("doc_id"), col("lang"),
      col("source"), col("n_chars").cast("int").as("n_chars"),
      // NUMERIC column: rides the 17-byte scaled-decimal path
      // through the binary write+read, hash-checked vs the oracle
      (col("n_chars") * lit(1.25)).cast("decimal(15,2)")
        .as("amount")))
      .withColumn("amount", col("amount").cast("double"))
      .orderBy("doc_id")
  }
  /** Memoized BINARY round-trip scaffold shared by the three Access
    * scan gates (r12 review: Jet4/ACE/Jet3 carried three copies):
    * write the projected documents once per (session, sfDir, key) to
    * /tmp through the jetmdb writer at `version`, read the table
    * back, order by doc_id. */
  private def jetRoundtrip(
      s: SparkSession, d: String, key: String, suffix: String,
      version: Option[String], cols: Seq[Column]): DataFrame = {
    val file = graft.sources.SessionCache
      .getOrElseUpdate(s, ("ingest", d, key)) {
        val out = s"/tmp/graft_ingest_${d.hashCode.toHexString}$suffix"
        var w = documents(s, d).select(cols: _*)
          .write.mode("overwrite").format("jetmdb")
          .option("table", "documents")
        version.foreach(v => w = w.option("version", v))
        w.save(out)
        out
      }
    s.read.format("jetmdb").option("table", "documents").load(file)
      .orderBy("doc_id")
  }


  /** ACE (`.accdb`) twin of [[qScanJetMdb]] (r12): documents
    * round-trip through the ACE writer/reader — version byte 0x02 on
    * page 0, plus a BIGINT Large Number column whose EVERY value
    * exceeds double precision (2^53 + doc_id·1000003 + n_chars —
    * overflow-safe even at 10^12 documents, r12 review: the first
    * draft's 10^15-scale multiplier overflowed int64 at the
    * FIXTURES.md-documented sf0.1 row count), so the int64 path is
    * exact end-to-end — putting the `.accdb` surface under the
    * driver hash gate rather than spec-only evidence. */
  val qScanAccdb: QDef = QDef(
    "q_scan_accdb",
    """SELECT CAST(doc_id AS INT) AS doc_id, lang,
      |  CAST(n_chars AS INT) AS n_chars,
      |  CAST(9007199254740993 + doc_id * 1000003 + n_chars
      |    AS BIGINT) AS big_id
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    jetRoundtrip(s, d, "accdb", ".accdb", Some("ace"), Seq(
      col("doc_id").cast("int").as("doc_id"), col("lang"),
      col("n_chars").cast("int").as("n_chars"),
      (lit(9007199254740993L) + col("doc_id") * lit(1000003L) +
        col("n_chars")).cast("bigint").as("big_id")))
  }

  /** ACE COMPLEX round-trip (r13): every document's text is split
    * into two 40-char chunk structs, written as an attachment-style
    * `array<struct<k,piece>>` column through the production complex
    * writer (main table stores the u32 key; chunks land in the
    * hidden flat side table linked via MSysComplexColumns), read
    * back through the flat-table resolver, and EXPLODED to scalar
    * rows for the hash gate — the oracle rebuilds the chunks with
    * plain substr over documents, so the whole key-assignment /
    * flat-table / element-order machinery is value-pinned, not just
    * spec-pinned. Chunks past a short text render as '' on both
    * engines (substr past length), never NULL. */
  val qScanAccdbComplex: QDef = QDef(
    "q_scan_accdb_complex",
    """SELECT CAST(doc_id AS INT) AS doc_id, CAST(ks.k AS INT) AS k,
      |  substr(text, 1 + ks.k * 40, 40) AS piece
      |FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
      |ORDER BY doc_id, k""".stripMargin) { (s, d) =>
    val file = graft.sources.SessionCache
      .getOrElseUpdate(s, ("ingest", d, "accdb_cx")) {
        val out = s"/tmp/graft_ingest_${d.hashCode.toHexString}_cx.accdb"
        documents(s, d).select(
          col("doc_id").cast("int").as("doc_id"),
          array(
            struct(lit(0).as("k"),
              substring(col("text"), 1, 40).as("piece")),
            struct(lit(1).as("k"),
              substring(col("text"), 41, 40).as("piece"))).as("chunks"))
          .write.mode("overwrite").format("jetmdb")
          .option("table", "documents").option("version", "ace")
          .save(out)
        out
      }
    s.read.format("jetmdb").option("table", "documents").load(file)
      .select(col("doc_id"), explode(col("chunks")).as("c"))
      .select(col("doc_id"), col("c.k").as("k"),
        col("c.piece").as("piece"))
      .orderBy(col("doc_id"), col("k"))
  }

  /** The SIMPLE multi-valued field round trip (r14): an
    * `array<string>` column writes straight through the ACE complex
    * machinery — the writer auto-wraps it as the single "Value"
    * payload column Access itself creates, and the reader unwraps
    * the same shape back to `array<scalar>`, so the round trip is
    * identity with NO manual named_struct step (the r13 writer's
    * rejection recipe). Element order (the flat table's AutoNumber
    * pk) is pinned by posexplode against the oracle's unnest
    * index. */
  val qScanAccdbMvf: QDef = QDef(
    "q_scan_accdb_mvf",
    """SELECT CAST(doc_id AS INT) AS doc_id, CAST(ks.k AS INT) AS k,
      |  substr(text, 1 + ks.k * 30, 30) AS tag
      |FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
      |ORDER BY doc_id, k""".stripMargin) { (s, d) =>
    val file = graft.sources.SessionCache
      .getOrElseUpdate(s, ("ingest", d, "accdb_mvf")) {
        val out = s"/tmp/graft_ingest_${d.hashCode.toHexString}_mvf.accdb"
        documents(s, d).select(
          col("doc_id").cast("int").as("doc_id"),
          array(
            substring(col("text"), 1, 30),
            substring(col("text"), 31, 30)).as("tags"))
          .write.mode("overwrite").format("jetmdb")
          .option("table", "documents").option("version", "ace")
          .save(out)
        out
      }
    s.read.format("jetmdb").option("table", "documents").load(file)
      .select(col("doc_id"),
        posexplode(col("tags")).as(Seq("k", "tag")))
      .orderBy(col("doc_id"), col("k"))
  }

  /** Jet3 (Access 97) twin (r12): the same documents round-trip
    * through the Jet3 writer/reader — 2048-byte pages, CP1252 text,
    * u8 row offsets — putting the Access-97 binary path under the
    * driver hash gate next to its Jet4 (q_scan_jetmdb) and ACE
    * (q_scan_accdb) siblings. Values stay inside the Jet3 profile:
    * int32 ids, short single-byte text, ≤255-byte rows. */
  val qScanJet3: QDef = QDef(
    "q_scan_jet3",
    """SELECT CAST(doc_id AS INT) AS doc_id, lang, source,
      |  CAST(n_chars AS INT) AS n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    jetRoundtrip(s, d, "jet3", "_97.mdb", Some("jet3"), Seq(
      col("doc_id").cast("int").as("doc_id"), col("lang"),
      col("source"), col("n_chars").cast("int").as("n_chars")))
  }

  /** ANSI-safe ingestion scalars: try_cast / try_divide / try_to_number
    * return NULL where the strict form would raise — the policy layer a
    * migration needs when source data is dirty but the job must not
    * die. Deliberately fed malformed AND well-formed values derived
    * deterministically from orders. */
  val qTryFuncs: QDef = QDef(
    "q_try_funcs",
    """SELECT o_orderkey,
      |  TRY_CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_orderpriority
      |    ELSE substr(o_orderpriority, 1, 1) END AS INT) AS pri_num,
      |  o_totalprice / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0.0)
      |    AS safe_div,
      |  TRY_CAST(o_orderstatus AS DATE) IS NULL AS date_rejected
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d)
      .select(
        col("o_orderkey"),
        // 10% dirty, 90% parseable — try_cast's intended regime. The
        // NULL-on-error path throws-and-catches PER FAILING ROW inside
        // codegen, so an all-fail column costs ~10 µs/row (measured
        // 1.4 s over 150 k); a mostly-invalid column should get an
        // rlike guard instead of try_cast.
        expr("""try_cast(CASE WHEN o_orderkey % 10 = 0
          THEN o_orderpriority
          ELSE substring(o_orderpriority, 1, 1) END AS int)""")
          .as("pri_num"),
        try_divide(col("o_totalprice"),
          (col("o_orderkey") % 3).cast("double")).as("safe_div"),
        // boolean, not the (all-null) DATE itself: an all-null date
        // column renders reader-dependently in the driver's hash
        // (None vs NaT — the DECIMAL-class trap, SURVEY §0)
        expr("try_cast(o_orderstatus AS date)").isNull
          .as("date_rejected"))
      .orderBy(col("o_orderkey"))
  }

  /** Change-data-capture diff between two table snapshots: one full
    * outer join on the primary key classifies every key as added /
    * removed / changed (unchanged keys are filtered out — at 100 TB the
    * diff output is small even when the snapshots are not). The two
    * snapshots are derived deterministically from orders so the oracle
    * can rebuild them: "old" drops keys ≡ 9 (mod 10), "new" drops keys
    * ≡ 0 (mod 10) and bumps the price of keys ≡ 0 (mod 7). The bumped
    * price is only COMPARED, never emitted — x * 1.1 is the same IEEE
    * double on both engines, so the inequality is deterministic even
    * though the product is inexact. */
  val qSnapshotDiff: QDef = QDef(
    "q_snapshot_diff",
    """WITH old AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 10 <> 9),
      |new AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 10 <> 0)
      |SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
      |  CASE WHEN old.o_orderkey IS NULL THEN 'added'
      |       WHEN new.o_orderkey IS NULL THEN 'removed'
      |       ELSE 'changed' END AS change_type
      |FROM old FULL OUTER JOIN new USING (o_orderkey)
      |WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
      |   OR old.o_orderstatus <> new.o_orderstatus
      |   OR old.o_totalprice <> new.o_totalprice
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val old = o.filter(col("o_orderkey") % 10 =!= 9)
    val neu = o.filter(col("o_orderkey") % 10 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 1.1)
          .otherwise(col("o_totalprice")))
    val lk = old.columns.map(c => old(c).as(s"old_$c"))
    val rk = neu.columns.map(c => neu(c).as(s"new_$c"))
    old.select(lk.toIndexedSeq: _*)
      .join(neu.select(rk.toIndexedSeq: _*),
        col("old_o_orderkey") === col("new_o_orderkey"), "full_outer")
      .select(
        coalesce(col("old_o_orderkey"), col("new_o_orderkey"))
          .as("o_orderkey"),
        when(col("old_o_orderkey").isNull, "added")
          .when(col("new_o_orderkey").isNull, "removed")
          .otherwise("changed").as("change_type"),
        (col("old_o_orderkey").isNull || col("new_o_orderkey").isNull ||
          col("old_o_orderstatus") =!= col("new_o_orderstatus") ||
          col("old_o_totalprice") =!= col("new_o_totalprice"))
          .as("differs"))
      .filter(col("differs"))
      .drop("differs")
      .orderBy(col("o_orderkey"))
  }

  /** Column profiling — the ANALYZE surface a migration tool runs
    * before and after a load: per-column null and distinct counts in
    * one pass (every aggregate partial-merges, so profiling 100 TB is
    * one scan + one tiny shuffle). Min/max are deliberately absent
    * from the contract here: their cross-engine VARCHAR renderings
    * differ per type; the count surface is the load-validation core. */
  val qProfileTable: QDef = QDef(
    "q_profile_table",
    """SELECT col_name, n_nulls, n_distinct FROM (
      |  SELECT 'o_custkey' AS col_name,
      |    COUNT(*) - COUNT(o_custkey) AS n_nulls,
      |    COUNT(DISTINCT o_custkey) AS n_distinct FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
      |    COUNT(DISTINCT o_orderstatus) FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
      |    COUNT(DISTINCT o_orderpriority) FROM orders
      |  UNION ALL
      |  SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
      |    COUNT(DISTINCT o_totalprice) FROM orders)
      |ORDER BY col_name""".stripMargin) { (s, d) =>
    val o = orders(s, d)
    val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority",
      "o_totalprice")
    // ONE aggregation computes every column's stats (a UNION of
    // per-column scans — the oracle's readable form — would scan the
    // table once per column)
    val agg = o.agg(
      count(lit(1)).as("n"),
      cols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"))): _*)
    val stacked = cols.map { c =>
      agg.select(
        lit(c).as("col_name"),
        (col("n") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"))
    }.reduce(_.unionByName(_))
    stacked.orderBy(col("col_name"))
  }

  /** Order-insensitive table checksum — "did the loaded table equal
    * the source": md5 each row's canonical rendering, fold a 56-bit
    * slice of it with SUM (commutative, so partitioning and row order
    * cannot change the result), alongside the row count. Cheap to
    * compute on both ends of a migration and to compare. The per-row
    * slice is 56 bits; the fold accumulates exactly in DECIMAL(38,0)
    * (Spark) / HUGEINT (DuckDB) — a BIGINT fold overflows ANSI
    * arithmetic within thousands of rows — and the checksum is emitted
    * as its decimal STRING, which renders identically on both engines
    * at scale 0. */
  val qTableChecksum: QDef = QDef(
    "q_table_checksum",
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(('0x' || substr(md5(
      |    CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
      |      o_orderpriority), 1, 14)) AS BIGINT)) AS VARCHAR) AS checksum
      |FROM orders""".stripMargin) { (s, d) =>
    orders(s, d)
      .select(
        graft.functions.Md5HexSlice(concat_ws("|",
          col("o_orderkey").cast("string"), col("o_orderstatus"),
          col("o_orderpriority")).cast("binary"), 1, 14)
          .cast("decimal(38,0)").as("h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h")).cast("string").as("checksum"))
  }

  /** CDC log application — the change-stream → snapshot materializer
    * every warehouse replication path needs (and the batch core of a
    * streaming CDC consumer). A deterministic 1-3 version change log
    * is derived from orders (insert for all; update for key%3=0;
    * delete for key%21=0), then applied: latest sequence number wins
    * per key, deletes drop the key. The engine's argmax is ONE
    * partial-aggregated max(struct(seq, …)) per key — no window, no
    * sort, the shuffle moves one row per key; the oracle states the
    * same with ROW_NUMBER. Output is the bounded per-status rollup of
    * the applied snapshot. */
  val qCdcApply: QDef = QDef(
    "q_cdc_apply",
    """WITH log AS (
      |  SELECT o_orderkey AS k, 1 AS seq, 'I' AS op, o_orderstatus
      |      AS st, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      |    FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 2, 'U', o_orderstatus,
      |      CAST(ROUND(o_totalprice * 100) AS BIGINT) + 500
      |    FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 3, 'D', o_orderstatus, 0
      |    FROM orders WHERE o_orderkey % 21 = 0),
      |latest AS (
      |  SELECT k, op, st, cents FROM (
      |    SELECT k, op, st, cents,
      |      ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      |    FROM log) WHERE rn = 1)
      |SELECT st AS status, COUNT(*) AS n_live,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents
      |FROM latest WHERE op <> 'D'
      |GROUP BY st
      |ORDER BY st""".stripMargin) { (s, d) =>
    val o = orders(s, d).select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("st"),
      round(col("o_totalprice") * 100).cast("bigint").as("cents"))
    val log = o.select(col("k"), lit(1).as("seq"), lit("I").as("op"),
        col("st"), col("cents"))
      .unionAll(o.filter(col("k") % 3 === 0)
        .select(col("k"), lit(2).as("seq"), lit("U").as("op"),
          col("st"), (col("cents") + 500).as("cents")))
      .unionAll(o.filter(col("k") % 21 === 0)
        .select(col("k"), lit(3).as("seq"), lit("D").as("op"),
          col("st"), lit(0L).as("cents")))
    log
      .groupBy(col("k"))
      .agg(max(struct(col("seq"), col("op"), col("st"), col("cents")))
        .as("v"))
      .where(col("v.op") =!= "D")
      .groupBy(col("v.st").as("status"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("v.cents")).as("sum_cents"))
      .orderBy(col("status"))
  }

  /** The schema-translation stage AS DATA: the full Jet→PostgreSQL
    * type mapping (every one of the 14 Jet types) plus the column-name
    * sanitization rules, emitted row-per-column exactly as
    * `MigrationPipeline.ddl` would render them — the engine's
    * `mdb-schema … postgres` analog, pinned under the driver's hash
    * gate. The oracle restates the documented §1.2 mapping as literal
    * rows, so any drift in either the mapping or the sanitizer fails
    * the round's correctness artifact, not just a unit test. */
  val qMigrationDdl: QDef = {
    import graft.sources.JetTypes
    // a representative Access table exercising every Jet type and the
    // sanitizer's corner cases (spaces, symbols, leading digit)
    val jetCols: Seq[(String, JetTypes.JetType)] = Seq(
      "Order ID" -> JetTypes.LongInteger,
      "Is Active?" -> JetTypes.YesNo,
      "Priority Code" -> JetTypes.JetByte,
      "Line No" -> JetTypes.JetInteger,
      "Weight (kg)" -> JetTypes.Single,
      "Unit Price" -> JetTypes.Currency,
      "Exact Rate" -> JetTypes.Numeric(28, 6),
      "Growth %" -> JetTypes.JetDouble,
      "Ordered At" -> JetTypes.DateTime,
      "Customer Name" -> JetTypes.ShortText,
      "Notes" -> JetTypes.Memo,
      "Attachment" -> JetTypes.OleObject,
      "Home Page" -> JetTypes.Hyperlink,
      "2nd Replica ID" -> JetTypes.ReplicationId)
    val rows = jetCols.zipWithIndex.map { case ((raw, t), i) =>
      (i + 1, raw, JetTypes.sanitizeName(raw), t.name,
        JetTypes.toPostgres(t), JetTypes.toSpark(t).simpleString)
    }
    val oracleRows = rows
      .map { case (o, raw, san, jet, pg, sp) =>
        s"($o, '$raw', '$san', '$jet', '$pg', '$sp')"
      }
      .mkString(",\n|  ")
    QDef(
      "q_migration_ddl",
      s"""SELECT * FROM (VALUES
        |  $oracleRows)
        |AS t(ordinal, source_column, column_name, jet_type, pg_type,
        |     spark_type)
        |ORDER BY ordinal""".stripMargin) { (s, _) =>
      s.createDataFrame(rows).toDF(
        "ordinal", "source_column", "column_name", "jet_type",
        "pg_type", "spark_type")
        .orderBy(col("ordinal"))
    }
  }

  /** The POST-LOAD CONSTRAINTS stage AS DATA (the q_migration_ddl
    * pattern, one lifecycle step later): a representative Access
    * schema — PK/unique/plain indexes plus enforced, cascading,
    * multi-semantics relationships — rendered through
    * `MigrationPipeline.constraintDdl` exactly as the post-load stage
    * would execute it against PostgreSQL, one row per statement. The
    * oracle restates the expected DDL as literal rows, so drift in
    * index→DDL or MSysRelationships→FK translation fails the round's
    * correctness artifact. The Derby E2E (constraints actually applied
    * and enforced after a load) lives in MigrationPipelineSpec. */
  val qMigrationConstraints: QDef = {
    import graft.etl.MigrationPipeline
    import graft.sources.jetmdb.JetMdbFormat.JetIndex
    import graft.sources.jetmdb.JetMdbSource.JetRelationshipRow
    val specs = Seq(
      MigrationPipeline.TableSpec("Customers", null, Nil, Seq(
        JetIndex("PrimaryKey", Seq("Customer ID"),
          unique = true, primary = true),
        JetIndex("ByName", Seq("Company Name"),
          unique = false, primary = false)),
        // Access AutoNumber on the PK — the retrofitted-identity +
        // sequence-alignment statements join the constraint stage
        autoNumberCols = Seq("Customer ID")),
      MigrationPipeline.TableSpec("Orders", null, Nil, Seq(
        JetIndex("PrimaryKey", Seq("Order ID"),
          unique = true, primary = true))),
      MigrationPipeline.TableSpec("Order Details", null, Nil, Seq(
        JetIndex("PrimaryKey", Seq("Order ID", "Product ID"),
          unique = true, primary = true),
        JetIndex("Line No", Seq("Line No"),
          unique = true, primary = false))))
    val rels = Seq(
      // enforced, ON DELETE CASCADE (dbRelationDeleteCascade)
      JetRelationshipRow("CustomersOrders", "Orders", "Customer ID",
        "Customers", "Customer ID", 0, 1, 0x1000),
      // enforced, ON UPDATE CASCADE (dbRelationUpdateCascade)
      JetRelationshipRow("OrdersDetails", "Order Details", "Order ID",
        "Orders", "Order ID", 0, 1, 0x100),
      // declared but NOT enforced (dbRelationDontEnforce)
      JetRelationshipRow("LegacyShipper", "Orders", "Ship Via",
        "Shippers", "Shipper ID", 0, 1, 0x2))
    // The oracle is HAND-WRITTEN literal DDL — not re-rendered from
    // constraintDdl's own output (which would be circular and unable
    // to catch translation drift at run time; the r9 ADVICE finding).
    // Any change to index→DDL or MSysRelationships→FK rendering now
    // diverges from these literals and fails the driver hash gate.
    val expected = Seq(
      (1, "primary_key", "ALTER TABLE customers ADD CONSTRAINT " +
        "customers_pkey PRIMARY KEY (\"customer_id\")"),
      (2, "primary_key", "ALTER TABLE orders ADD CONSTRAINT " +
        "orders_pkey PRIMARY KEY (\"order_id\")"),
      (3, "primary_key", "ALTER TABLE order_details ADD CONSTRAINT " +
        "order_details_pkey PRIMARY KEY (\"order_id\", \"product_id\")"),
      (4, "index", "CREATE INDEX idx_customers_byname ON customers " +
        "(\"company_name\")"),
      (5, "index", "CREATE UNIQUE INDEX idx_order_details_line_no ON " +
        "order_details (\"line_no\")"),
      (6, "identity", "ALTER TABLE customers ALTER COLUMN " +
        "\"customer_id\" ADD GENERATED BY DEFAULT AS IDENTITY"),
      (7, "identity", "SELECT setval(pg_get_serial_sequence(" +
        "'customers', 'customer_id'), COALESCE((SELECT " +
        "MAX(\"customer_id\") FROM customers), 0) + 1, false)"),
      (8, "foreign_key", "ALTER TABLE orders ADD CONSTRAINT " +
        "fk_customersorders FOREIGN KEY (\"customer_id\") REFERENCES " +
        "customers (\"customer_id\") ON DELETE CASCADE"),
      (9, "comment", "-- relationship legacyshipper: orders(ship_via)" +
        " -> shippers(shipper_id) not enforced in Access " +
        "(dbRelationDontEnforce); no constraint emitted"),
      (10, "foreign_key", "ALTER TABLE order_details ADD CONSTRAINT " +
        "fk_ordersdetails FOREIGN KEY (\"order_id\") REFERENCES " +
        "orders (\"order_id\") ON UPDATE CASCADE"))
    val oracleRows = expected
      .map { case (o, k, s) => s"($o, '$k', '${s.replace("'", "''")}')" }
      .mkString(",\n|  ")
    QDef(
      "q_migration_constraints",
      s"""SELECT * FROM (VALUES
        |  $oracleRows)
        |AS t(ordinal, stmt_kind, ddl)
        |ORDER BY ordinal""".stripMargin) { (s, _) =>
      // the QUERY side alone runs the translator: constraintDdl at
      // execution time, kind derived from each statement's shape
      val ddl = MigrationPipeline.constraintDdl(specs, rels)
      val rows = ddl.zipWithIndex.map { case (stmt, i) =>
        val kind =
          if (stmt.startsWith("--")) "comment"
          else if (stmt.contains("PRIMARY KEY")) "primary_key"
          else if (stmt.startsWith("CREATE")) "index"
          else if (stmt.contains("IDENTITY") || stmt.startsWith("SELECT"))
            "identity"
          else "foreign_key"
        (i + 1, kind, stmt)
      }
      s.createDataFrame(rows)
        .toDF("ordinal", "stmt_kind", "ddl")
        .orderBy(col("ordinal"))
    }
  }

  /** An Access SAVED QUERY ported through the [[graft.sources.JetSql]]
    * translator and EXECUTED — brackets, IIF, NZ, `&` concat, a
    * `#date#` literal, Jet LIKE wildcards, and TOP all in one
    * statement, run by `spark.sql` over the registered orders view.
    * The oracle is the hand-written ANSI equivalent, so the
    * translator's OUTPUT (not just its text) sits under the driver
    * hash gate: a rewrite that parses but changes semantics fails the
    * round's correctness artifact. */
  val qJetSqlSaved: QDef = QDef(
    "q_jetsql_saved",
    """SELECT o_orderkey,
      |  upper(o_orderstatus) || '/' ||
      |    (CASE WHEN o_totalprice > 200000 THEN 'BIG'
      |      ELSE coalesce(o_orderpriority, '?') END) AS tag
      |FROM orders
      |WHERE o_orderdate >= DATE '1995-01-01'
      |  AND o_orderpriority LIKE '1-%'
      |ORDER BY o_orderkey
      |LIMIT 50""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "SELECT TOP 50 [o_orderkey],",
      "  UCase([o_orderstatus]) & \"/\" &",
      "    IIf([o_totalprice] > 200000, \"BIG\",",
      "        Nz([o_orderpriority], \"?\")) AS tag",
      "FROM orders",
      "WHERE [o_orderdate] >= #1/1/1995#",
      "  AND [o_orderpriority] LIKE \"1-*\"",
      "ORDER BY [o_orderkey]").mkString(" ")
    // o_orderkey is orders' primary key: declaring it unique keeps
    // the tie-faithful TOP n translation on its LIMIT fast path
    // (TakeOrdered, no global window) — the declaration a real
    // migration derives from the .mdb's own index catalog via
    // MigrationPipeline.uniqueKeysFromSpecs
    s.sql(graft.sources.JetSql.translate(saved, Map.empty,
      Map("orders" -> Seq(Set("o_orderkey")))))
  }

  /** Second translated saved query, exercising the translator
    * surfaces q_jetsql_saved doesn't: Mid/InStr/Len renames, the
    * BANKER'S-rounding CLng (Access CLng(2.5)=2 — a plain cast would
    * truncate; the oracle recomputes with DuckDB's own roundbankers,
    * so the Access semantic itself is hash-pinned), and a #date time#
    * TIMESTAMP literal in a filter. */
  val qJetSqlSaved2: QDef = QDef(
    "q_jetsql_saved2",
    """SELECT o_orderkey,
      |  substr(o_orderpriority, 3, 6) AS pri_word,
      |  CAST(instr(o_orderpriority, '-') AS INT) AS dash_at,
      |  CAST(roundbankers(o_totalprice / 1000, 0) AS BIGINT) AS kilo,
      |  CAST(length(o_orderstatus) AS INT) AS st_len
      |FROM orders
      |WHERE CAST(o_orderdate AS TIMESTAMP)
      |    < TIMESTAMP '1995-06-15 12:30:00'
      |  AND o_orderkey % 7 = 0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "SELECT [o_orderkey],",
      "  Mid([o_orderpriority], 3, 6) AS pri_word,",
      "  InStr([o_orderpriority], \"-\") AS dash_at,",
      "  CLng([o_totalprice] / 1000) AS kilo,",
      "  Len([o_orderstatus]) AS st_len",
      "FROM orders",
      "WHERE [o_orderdate] < #6/15/1995 12:30#",
      "  AND [o_orderkey] Mod 7 = 0",
      "ORDER BY [o_orderkey]").mkString(" ")
    import org.apache.spark.sql.functions.{col => c}
    s.sql(graft.sources.JetSql.translate(saved))
      .select(c("o_orderkey"), c("pri_word"),
        c("dash_at").cast("int").as("dash_at"),
        c("kilo").cast("bigint").as("kilo"),
        c("st_len").cast("int").as("st_len"))
      .orderBy(c("o_orderkey"))
  }

  /** Third translated saved query — the round-10 translations under
    * the driver hash gate at once: a Jet charlist LIKE (→ anchored
    * RLIKE; the oracle recomputes with DuckDB's own regexp_matches,
    * so the regex mapping itself is hash-pinned), the Access-designer
    * default DISTINCTROW on a single table (→ dropped, Access's own
    * semantics), and TOP n PERCENT (→ the tie-aware RANK ≤
    * CEILING(pct of COUNT) form). The ORDER BY key is
    * o_orderpriority, so the 10% boundary lands INSIDE a tie group
    * and Access semantics require the WHOLE group back — a plain
    * LIMIT would cut it mid-group and hash-mismatch. */
  val qJetSqlSaved3: QDef = QDef(
    "q_jetsql_saved3",
    """SELECT o_orderkey, o_orderpriority FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    RANK() OVER (ORDER BY o_orderpriority) AS rk,
      |    COUNT(*) OVER () AS n
      |  FROM orders
      |  WHERE regexp_matches(o_orderpriority, '^[12]-.*$')
      |    AND regexp_matches(o_orderstatus, '^[^P]$')
      |) WHERE rk <= CEILING(n * 10 / 100.0)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "SELECT DISTINCTROW TOP 10 PERCENT [o_orderkey], [o_orderpriority]",
      "FROM orders",
      "WHERE [o_orderpriority] LIKE \"[12]-*\"",
      "  AND [o_orderstatus] LIKE \"[!P]\"",
      "ORDER BY [o_orderpriority]").mkString(" ")
    s.sql(graft.sources.JetSql.translate(saved))
      .orderBy(col("o_orderkey"))
  }

  /** An Access CROSSTAB (TRANSFORM … PIVOT) saved query ported through
    * the translator and EXECUTED: Jet crosstabs become ANSI conditional
    * aggregation (one `agg(CASE WHEN pivotExpr = v THEN arg END)`
    * column per IN heading), so the same text runs on Spark and any
    * ANSI engine. The aggregate rides through CCur — Access Currency
    * is EXACT 4-decimal fixed point, so the per-cell sums accumulate
    * in DECIMAL on both sides and the only double conversion is the
    * final rounded output (the determinism contract's accumulate-
    * exact/emit-double rule, expressed in Jet's own type system). */
  val qJetSqlCrosstab: QDef = QDef(
    "q_jetsql_crosstab",
    """SELECT o_orderpriority AS pri, COUNT(*) AS n_orders,
      |  ROUND(CAST(SUM(CASE WHEN year(o_orderdate) = 1995
      |    THEN CAST(roundbankers(o_totalprice, 4) AS DECIMAL(19,4))
      |    END) AS DOUBLE), 2) AS "1995",
      |  ROUND(CAST(SUM(CASE WHEN year(o_orderdate) = 1996
      |    THEN CAST(roundbankers(o_totalprice, 4) AS DECIMAL(19,4))
      |    END) AS DOUBLE), 2) AS "1996",
      |  ROUND(CAST(SUM(CASE WHEN year(o_orderdate) = 1997
      |    THEN CAST(roundbankers(o_totalprice, 4) AS DECIMAL(19,4))
      |    END) AS DOUBLE), 2) AS "1997"
      |FROM orders
      |WHERE o_orderdate >= DATE '1995-01-01'
      |  AND o_orderdate < DATE '1998-01-01'
      |GROUP BY o_orderpriority
      |ORDER BY pri""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "TRANSFORM Sum(CCur([o_totalprice]))",
      "SELECT [o_orderpriority] AS pri, Count(*) AS n_orders",
      "FROM orders",
      "WHERE [o_orderdate] >= #1/1/1995#",
      "  AND [o_orderdate] < #1/1/1998#",
      "GROUP BY [o_orderpriority]",
      "PIVOT Year([o_orderdate]) IN (1995, 1996, 1997)").mkString(" ")
    val df = s.sql(graft.sources.JetSql.translate(saved))
    df.select(col("pri"), col("n_orders"),
      round(col("1995").cast("double"), 2).as("1995"),
      round(col("1996").cast("double"), 2).as("1996"),
      round(col("1997").cast("double"), 2).as("1997"))
      .orderBy(col("pri"))
  }

  /** An Access PARAMETER query ported and executed: the `PARAMETERS`
    * header's DECLARED types drive the literal rendering of the
    * caller's bindings (DateTime → DATE literal, Currency →
    * banker's-rounded 4-decimal, Text → quoted, Long → integer), so a
    * parameterized saved query ports as a function of its bindings —
    * the oracle inlines the same literals by hand. */
  val qJetSqlParams: QDef = QDef(
    "q_jetsql_params",
    """SELECT o_orderkey, o_orderpriority,
      |  ROUND(CAST(CAST(roundbankers(o_totalprice, 4) AS DECIMAL(19,4))
      |    AS DOUBLE), 2) AS total_cur
      |FROM orders
      |WHERE o_orderdate >= DATE '1996-02-01'
      |  AND CAST(roundbankers(o_totalprice, 4) AS DECIMAL(19,4))
      |    <= 150000.0000
      |  AND o_orderpriority = '2-HIGH'
      |  AND o_orderkey % 3 = 0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "PARAMETERS [Start Date] DateTime, [Max Total] Currency,",
      "  [Pri] Text(20), [Key Step] Long;",
      "SELECT [o_orderkey], [o_orderpriority],",
      "  CCur([o_totalprice]) AS total_cur",
      "FROM orders",
      "WHERE [o_orderdate] >= [Start Date]",
      "  AND CCur([o_totalprice]) <= [Max Total]",
      "  AND [o_orderpriority] = [Pri]",
      "  AND [o_orderkey] Mod [Key Step] = 0",
      "ORDER BY [o_orderkey]").mkString(" ")
    val sql = graft.sources.JetSql.translate(saved, Map(
      "Start Date" -> java.time.LocalDate.of(1996, 2, 1),
      "Max Total" -> BigDecimal(150000),
      "Pri" -> "2-HIGH",
      "Key Step" -> 3L))
    s.sql(sql)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("total_cur").cast("double"), 2).as("total_cur"))
      .orderBy(col("o_orderkey"))
  }

  /** Access DOMAIN AGGREGATES (DSum/DCount) executed: the functions
    * form-bound Access apps lean on everywhere, translated to scalar
    * subqueries whose string arguments are themselves Jet-SQL
    * fragments (brackets, CCur, #date# literals all recurse). The
    * oracle writes the subqueries directly. */
  val qJetSqlDomainAgg: QDef = QDef(
    "q_jetsql_domain_agg",
    """SELECT c_mktsegment AS seg, COUNT(*) AS n_cust,
      |  (SELECT COUNT(*) FROM orders
      |   WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  ROUND(CAST((SELECT SUM(CAST(roundbankers(o_totalprice, 4)
      |      AS DECIMAL(19,4)))
      |    FROM orders WHERE o_orderdate < DATE '1996-01-01')
      |    AS DOUBLE), 2) AS tot_95
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY seg""".stripMargin) { (s, d) =>
    customer(s, d).createOrReplaceTempView("customer")
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "SELECT [c_mktsegment] AS seg, Count(*) AS n_cust,",
      "  DCount(\"*\", \"orders\",",
      "    \"[o_orderpriority] = '1-URGENT'\") AS n_urgent,",
      "  DSum(\"CCur([o_totalprice])\", \"orders\",",
      "    \"[o_orderdate] < #1/1/1996#\") AS tot_95",
      "FROM customer",
      "GROUP BY [c_mktsegment]",
      "ORDER BY [seg]").mkString(" ")
    s.sql(graft.sources.JetSql.translate(saved))
      .select(col("seg"), col("n_cust"), col("n_urgent"),
        round(col("tot_95").cast("double"), 2).as("tot_95"))
      .orderBy(col("seg"))
  }

  /** The classic Access monthly rollup: `Format(date, "yyyy-mm")` as
    * the GROUP BY key — the single most common Jet reporting idiom.
    * Format's deterministic date-pattern subset translates to
    * date_format; the oracle recomputes the key with DuckDB's own
    * strftime, so the pattern mapping itself is hash-pinned. r13 adds
    * a NAME-mask label (weekday + abbreviated month — the masks the
    * r12 translator rejected) rebuilt by DuckDB's %A/%b, pinning the
    * en-US name tables Spark's Locale.US rendering assumes. */
  val qJetSqlFormat: QDef = QDef(
    "q_jetsql_format",
    """SELECT strftime(o_orderdate, '%Y-%m') AS ym,
      |  COUNT(*) AS n,
      |  min(strftime(o_orderdate, '%A, %b %-d')) AS first_lbl,
      |  ROUND(CAST(SUM(CAST(roundbankers(o_totalprice, 4)
      |    AS DECIMAL(19,4))) AS DOUBLE), 2) AS tot
      |FROM orders
      |WHERE o_orderdate < DATE '1997-01-01'
      |GROUP BY 1
      |ORDER BY ym""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "SELECT Format([o_orderdate], \"yyyy-mm\") AS ym,",
      "  Count(*) AS n,",
      "  Min(Format([o_orderdate], \"dddd, mmm d\")) AS first_lbl,",
      "  Sum(CCur([o_totalprice])) AS tot",
      "FROM orders",
      "WHERE [o_orderdate] < #1/1/1997#",
      "GROUP BY Format([o_orderdate], \"yyyy-mm\")",
      "ORDER BY [ym]").mkString(" ")
    s.sql(graft.sources.JetSql.translate(saved))
      .select(col("ym"), col("n"), col("first_lbl"),
        round(col("tot").cast("double"), 2).as("tot"))
      .orderBy(col("ym"))
  }

  /** A CHAIN of Access saved queries ported as views — the pattern
    * real databases ship: one saved query SELECTing from another. The
    * two queries are registered OUT of dependency order through
    * [[graft.sources.JetSql.registerSavedQueries]]'s fixpoint (Spark
    * analyzes view bodies eagerly, so ordering matters), then the
    * top-level report queries the derived view. The oracle rebuilds
    * the chain as CTEs. */
  val qJetSqlViews: QDef = QDef(
    "q_jetsql_views",
    """WITH ord_extended AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(roundbankers(o_totalprice, 4) AS DECIMAL(19,4))
      |      AS total_cur,
      |    year(o_orderdate) AS yr
      |  FROM orders WHERE o_orderstatus = 'F'),
      |pri_rollup AS (
      |  SELECT o_orderpriority AS pri, yr, COUNT(*) AS n,
      |    SUM(total_cur) AS tot
      |  FROM ord_extended WHERE yr <= 1997
      |  GROUP BY o_orderpriority, yr)
      |SELECT pri, CAST(yr AS INT) AS yr, n,
      |  ROUND(CAST(tot AS DOUBLE), 2) AS tot
      |FROM pri_rollup
      |ORDER BY pri, yr""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    graft.sources.JetSql.registerSavedQueries(s, Seq(
      // dependent query FIRST — the fixpoint must defer it one round
      "Pri Rollup" -> Seq(
        "SELECT [o_orderpriority] AS pri, [yr], Count(*) AS n,",
        "  Sum([total_cur]) AS tot",
        "FROM [Ord Extended]",
        "WHERE [yr] <= 1997",
        "GROUP BY [o_orderpriority], [yr]").mkString(" "),
      "Ord Extended" -> Seq(
        "SELECT [o_orderkey], [o_orderpriority],",
        "  CCur([o_totalprice]) AS total_cur,",
        "  Year([o_orderdate]) AS yr",
        "FROM orders WHERE [o_orderstatus] = \"F\"").mkString(" ")))
    s.sql(graft.sources.JetSql.translate(
      "SELECT [pri], [yr], [n], [tot] FROM [Pri Rollup] " +
        "ORDER BY [pri], [yr]"))
      .select(col("pri"), col("yr").cast("int").as("yr"), col("n"),
        round(col("tot").cast("double"), 2).as("tot"))
      .orderBy(col("pri"), col("yr"))
  }

  /** The Access date-arithmetic trio executed over real data: DatePart
    * interval codes, Weekday's Sunday=1 numbering, DateAdd's month-end
    * clamping, and DateDiff's BOUNDARY-COUNT semantics (month-index
    * differences, Sunday-anchored "ww" week crossings) — each
    * recomputed independently in the DuckDB oracle (date_diff for
    * days, explicit year/month index arithmetic for months, the
    * days-since-Sunday identity for weeks), so the Jet semantics
    * themselves sit under the driver hash gate. */
  val qJetSqlDateFuncs: QDef = QDef(
    "q_jetsql_datefuncs",
    """SELECT o_orderkey,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS wd,
      |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
      |  CAST(date_diff('day', o_orderdate,
      |    TIMESTAMP '1997-12-31 00:00:00') AS INT) AS days_left,
      |  CAST((1997 - year(o_orderdate)) * 12
      |    + 12 - month(o_orderdate) AS INT) AS months_left,
      |  CAST((date_diff('day', CAST(o_orderdate AS DATE),
      |      DATE '1997-12-31') - 3 + dayofweek(o_orderdate)) // 7
      |    AS BIGINT) AS weeks_left
      |FROM orders
      |WHERE o_orderkey % 13 = 0 AND o_orderdate < DATE '1997-07-01'
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "SELECT [o_orderkey],",
      "  DatePart(\"q\", [o_orderdate]) AS qtr,",
      "  DatePart(\"y\", [o_orderdate]) AS doy,",
      "  Weekday([o_orderdate]) AS wd,",
      "  DateAdd(\"m\", 2, [o_orderdate]) AS plus2m,",
      "  DateDiff(\"d\", [o_orderdate], #12/31/1997#) AS days_left,",
      "  DateDiff(\"m\", [o_orderdate], #12/31/1997#) AS months_left,",
      "  DateDiff(\"ww\", [o_orderdate], #12/31/1997#) AS weeks_left",
      "FROM orders",
      "WHERE [o_orderkey] Mod 13 = 0",
      "  AND [o_orderdate] < #7/1/1997#",
      "ORDER BY [o_orderkey]").mkString(" ")
    // DateDiff("ww") emits jet_weekstart (r13) — session-registered
    graft.GraftExtensions.register(s)
    s.sql(graft.sources.JetSql.translate(saved))
      .select(col("o_orderkey"),
        col("qtr").cast("int").as("qtr"),
        col("doy").cast("int").as("doy"),
        col("wd").cast("int").as("wd"),
        col("plus2m").cast("date").as("plus2m"),
        col("days_left").cast("int").as("days_left"),
        col("months_left").cast("int").as("months_left"),
        col("weeks_left").cast("bigint").as("weeks_left"))
      .orderBy(col("o_orderkey"))
  }

  /** NAMED Format()s and multi-section masks over real data (r14 —
    * the Access-designer defaults that were the most common remaining
    * saved-query rejection): Currency's en-US accounting rendering
    * ($ + grouping + parens negatives, rebuilt in DuckDB from
    * fmt-grouping over the cent-scaled BIGINT), a 2-section
    * pos;neg mask on a signed expression, Standard/Fixed, Percent on
    * a dyadic-exact ratio and Scientific on a tie-free operand (the
    * 4th significant digit is pinned to 3, so Java's shortest-repr
    * HALF_UP and DuckDB's exact-binary %E rounding cannot disagree —
    * see the double-rounding ledger note), a 3-section literal-zero
    * mask on a {-1,0,1} domain, Yes/No, and the named date formats
    * (Long/Medium/General Date) recomputed with DuckDB's own
    * strftime name tables. */
  val qJetSqlFormatNamed: QDef = QDef(
    "q_jetsql_format_named",
    """SELECT o_orderkey,
      |  '$' || format('{:,}', CAST(round(o_totalprice * 100, 0)
      |      AS BIGINT) // 100) || '.' ||
      |    lpad(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |      % 100 AS VARCHAR), 2, '0') AS cur,
      |  CASE WHEN o_totalprice - 150000 < 0
      |    THEN '($' || format('{:,}',
      |        CAST(round(abs(o_totalprice - 150000) * 100, 0)
      |          AS BIGINT) // 100) || '.' ||
      |      lpad(CAST(CAST(round(abs(o_totalprice - 150000) * 100, 0)
      |        AS BIGINT) % 100 AS VARCHAR), 2, '0') || ')'
      |    ELSE '$' || format('{:,}',
      |        CAST(round((o_totalprice - 150000) * 100, 0)
      |          AS BIGINT) // 100) || '.' ||
      |      lpad(CAST(CAST(round((o_totalprice - 150000) * 100, 0)
      |        AS BIGINT) % 100 AS VARCHAR), 2, '0')
      |    END AS acct,
      |  format('{:,}', CAST(round(o_totalprice * 100, 0)
      |      AS BIGINT) // 100) || '.' ||
      |    lpad(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |      % 100 AS VARCHAR), 2, '0') AS std,
      |  printf('%.2f', o_totalprice) AS fx,
      |  printf('%.2f', (o_orderkey % 5) / 4 * 100) || '%' AS pct,
      |  printf('%.2E', (o_orderkey % 97) + 0.33) AS sci,
      |  CASE o_orderkey % 3 WHEN 0 THEN '(1.00)'
      |    WHEN 1 THEN '0' ELSE '1.00' END AS tri,
      |  CASE WHEN o_totalprice > 150000 THEN 'Yes' ELSE 'No'
      |    END AS big,
      |  strftime(o_orderdate, '%A, %B %-d, %Y') AS ld,
      |  strftime(o_orderdate, '%d-%b-%y') AS md,
      |  strftime(o_orderdate, '%-m/%-d/%Y') AS gd,
      |  printf('%.2f', o_totalprice) || ' USD' AS usd
      |FROM orders
      |WHERE o_orderkey % 13 = 0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "SELECT [o_orderkey],",
      "  Format([o_totalprice], \"Currency\") AS cur,",
      "  Format([o_totalprice] - 150000, " +
        "\"$#,##0.00;($#,##0.00)\") AS acct,",
      "  Format([o_totalprice], \"Standard\") AS std,",
      "  Format([o_totalprice], \"Fixed\") AS fx,",
      "  Format(([o_orderkey] Mod 5) / 4, \"Percent\") AS pct,",
      "  Format(([o_orderkey] Mod 97) + 0.33, \"Scientific\") AS sci,",
      "  Format(([o_orderkey] Mod 3) - 1, \"0.00;(0.00);0\") AS tri,",
      "  Format(IIF([o_totalprice] > 150000, 1, 0), \"Yes/No\")" +
        " AS big,",
      "  Format([o_orderdate], \"Long Date\") AS ld,",
      "  Format([o_orderdate], \"Medium Date\") AS md,",
      "  Format([o_orderdate], \"General Date\") AS gd,",
      // quoted literal affix (r14.1) under the same hash gate
      "  Format([o_totalprice], \"0.00\"\" USD\"\"\") AS usd",
      "FROM orders",
      "WHERE [o_orderkey] Mod 13 = 0",
      "ORDER BY [o_orderkey]").mkString(" ")
    s.sql(graft.sources.JetSql.translate(saved))
      .select(col("o_orderkey"), col("cur"), col("acct"), col("std"),
        col("fx"), col("pct"), col("sci"), col("tri"), col("big"),
        col("ld"), col("md"), col("gd"), col("usd"))
      .orderBy(col("o_orderkey"))
  }

  /** The translator scalar edges executed over real data, each
    * recomputed independently in the DuckDB oracle:
    * DatePart("ww") under the default Sunday/Jan-1 numbering (DuckDB
    * rebuilds it from its own 0-based dayofweek), the accepted
    * default-valued firstdayofweek/firstweekofyear trailing
    * arguments, 4-arg InStr in both deterministic compare modes
    * (strpos vs lowered strpos), and the numeric Format masks
    * (printf for the plain form, fmt-grouping for #,##0).
    *
    * r13 adds the NON-default anchors under the same hash gate:
    * `wk_mon4` = DatePart("ww", d, vbMonday, vbFirstFourDays), which
    * DuckDB rebuilds from its ISO week machinery — the two agree
    * except that VB numbers late-December days within their own
    * calendar year (KB 200299), so when isoyear > year the oracle
    * steps back one week and adds 1; `wd_tue` = Weekday(d, vbTuesday),
    * a pure rotation of DuckDB's 0-based dayofweek. */
  val qJetSqlScalarEdges: QDef = QDef(
    "q_jetsql_scalar_edges",
    """SELECT o_orderkey,
      |  CAST(FLOOR((dayofyear(o_orderdate)
      |    + dayofweek(date_trunc('year', o_orderdate)) - 1) / 7)
      |    AS INT) + 1 AS wk,
      |  CAST(FLOOR((dayofyear(o_orderdate)
      |    + dayofweek(date_trunc('year', o_orderdate)) - 1) / 7)
      |    AS INT) + 1 AS wk_args,
      |  CAST(CASE WHEN isoyear(o_orderdate) > year(o_orderdate)
      |    THEN weekofyear(o_orderdate - INTERVAL 7 DAY) + 1
      |    ELSE weekofyear(o_orderdate) END AS INT) AS wk_mon4,
      |  CAST((dayofweek(o_orderdate) + 5) % 7 + 1 AS INT) AS wd_tue,
      |  CAST(strpos(lower(o_orderpriority), 'r') AS INT) AS pos_txt,
      |  CAST(strpos(o_orderpriority, 'R') AS INT) AS pos_bin,
      |  printf('%.2f', o_totalprice) AS amt,
      |  format('{:,}', CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |      // 100) || '.' ||
      |    lpad(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |      % 100 AS VARCHAR), 2, '0') AS amt_grp,
      |  CAST(CAST(round(o_totalprice, 0) AS BIGINT) AS VARCHAR)
      |    AS amt_whole
      |FROM orders
      |WHERE o_orderkey % 17 = 0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "SELECT [o_orderkey],",
      "  DatePart(\"ww\", [o_orderdate]) AS wk,",
      "  DatePart(\"ww\", [o_orderdate], 1, 1) AS wk_args,",
      "  DatePart(\"ww\", [o_orderdate], 2, 2) AS wk_mon4,",
      "  Weekday([o_orderdate], 3) AS wd_tue,",
      "  InStr(1, [o_orderpriority], \"r\", 1) AS pos_txt,",
      "  InStr(1, [o_orderpriority], \"R\", 0) AS pos_bin,",
      "  Format([o_totalprice], \"0.00\") AS amt,",
      "  Format([o_totalprice], \"#,##0.00\") AS amt_grp,",
      "  Format([o_totalprice], \"0\") AS amt_whole",
      "FROM orders",
      "WHERE [o_orderkey] Mod 17 = 0",
      "ORDER BY [o_orderkey]").mkString(" ")
    // DatePart("ww") emits jet_weeknum (r13) — session-registered
    graft.GraftExtensions.register(s)
    s.sql(graft.sources.JetSql.translate(saved))
      .select(col("o_orderkey"),
        col("wk").cast("int").as("wk"),
        col("wk_args").cast("int").as("wk_args"),
        col("wk_mon4").cast("int").as("wk_mon4"),
        col("wd_tue").cast("int").as("wd_tue"),
        col("pos_txt").cast("int").as("pos_txt"),
        col("pos_bin").cast("int").as("pos_bin"),
        col("amt"), col("amt_grp"), col("amt_whole"))
      .orderBy(col("o_orderkey"))
  }

  /** The r14 VBA function pack over real data, each recomputed
    * independently in DuckDB: Round → banker's (roundbankers) on
    * DYADIC-exact operands only — halves and quarters are exact in
    * both engines, so Spark's shortest-repr HALF_EVEN and DuckDB's
    * exact-binary rounding cannot disagree (the double-rounding
    * ledger discipline); Hex vs upper(to_hex); Val's digit-strip
    * parse vs direct string building; Chr through the guarded char()
    * path vs chr; Asc vs ascii on ASCII clerks; String(n, "*") vs
    * repeat; DateSerial's day-0/month-rollover forms vs last_day and
    * next-year make_date; TimeSerial vs interval arithmetic off
    * Jet's zero day; MonthName/WeekdayName (full + abbreviated,
    * composed with Weekday's Sunday=1) vs DuckDB's own strftime name
    * tables; Atn vs atan at the 4-decimal trig discipline. The
    * wave-5b/5c surfaces ride the same gate: FormatNumber/Currency
    * (the established cent-scaled grouping recipe), FormatPercent on
    * a dyadic-exact ratio, FormatDateTime code 2 vs %-m/%-d/%Y, and
    * CDate of an OLE serial on the exact quarter-day grid (rendered
    * as a string — tz-awareness differs across engines). */
  val qJetSqlVbaFuncs: QDef = QDef(
    "q_jetsql_vbafuncs",
    """SELECT o_orderkey,
      |  roundbankers((o_orderkey % 16) / 2, 0) AS rb,
      |  roundbankers((o_orderkey % 32) / 4, 1) AS rb2,
      |  upper(to_hex(o_orderkey)) AS hx,
      |  CAST(CAST(o_orderkey AS VARCHAR) || '2' AS DOUBLE) AS vl,
      |  chr(65 + CAST(o_orderkey % 26 AS INT)) AS ch,
      |  ascii(substr(o_orderpriority, CAST(o_orderkey % 5 AS INT) + 1,
      |    1)) AS ascv,
      |  repeat('*', CAST(o_orderkey % 5 AS INT) + 1) AS rep,
      |  last_day(o_orderdate) AS eom,
      |  make_date(CAST(year(o_orderdate) AS INT) + 1, 2, 2) AS ds2,
      |  strftime(TIMESTAMP '1899-12-30 00:00:00'
      |    + INTERVAL (o_orderkey % 30) HOUR
      |    - INTERVAL 15 MINUTE + INTERVAL 30 SECOND,
      |    '%Y-%m-%d %H:%M:%S') AS ts,
      |  strftime(o_orderdate, '%B') AS mn,
      |  strftime(o_orderdate, '%b') AS mna,
      |  strftime(o_orderdate, '%A') AS wdn,
      |  strftime(o_orderdate, '%a') AS wdna,
      |  ROUND(ATAN((o_orderkey % 7) / 2), 4) AS at,
      |  format('{:,}', CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |      // 100) || '.' ||
      |    lpad(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |      % 100 AS VARCHAR), 2, '0') AS fn,
      |  CASE WHEN o_totalprice - 150000 < 0
      |    THEN '($' || format('{:,}',
      |        CAST(round(abs(o_totalprice - 150000) * 100, 0)
      |          AS BIGINT) // 100) || '.' ||
      |      lpad(CAST(CAST(round(abs(o_totalprice - 150000) * 100, 0)
      |        AS BIGINT) % 100 AS VARCHAR), 2, '0') || ')'
      |    ELSE '$' || format('{:,}',
      |        CAST(round((o_totalprice - 150000) * 100, 0)
      |          AS BIGINT) // 100) || '.' ||
      |      lpad(CAST(CAST(round((o_totalprice - 150000) * 100, 0)
      |        AS BIGINT) % 100 AS VARCHAR), 2, '0')
      |    END AS fc,
      |  printf('%.2f', (o_orderkey % 8) / 16 * 100) || '%' AS fp,
      |  strftime(o_orderdate, '%-m/%-d/%Y') AS fdt,
      |  strftime(TIMESTAMP '1899-12-30 00:00:00'
      |    + INTERVAL (o_orderkey % 2000) DAY
      |    + INTERVAL ((o_orderkey % 4) * 21600) SECOND,
      |    '%Y-%m-%d %H:%M:%S') AS cd
      |FROM orders
      |WHERE o_orderkey % 19 = 0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders")
    val saved = Seq(
      "SELECT [o_orderkey],",
      "  Round(([o_orderkey] Mod 16) / 2) AS rb,",
      "  Round(([o_orderkey] Mod 32) / 4, 1) AS rb2,",
      "  Hex([o_orderkey]) AS hx,",
      "  Val(CStr([o_orderkey]) & \" 2 x8\") AS vl,",
      "  Chr(65 + ([o_orderkey] Mod 26)) AS ch,",
      "  Asc(Mid([o_orderpriority], ([o_orderkey] Mod 5) + 1, 1))" +
        " AS ascv,",
      "  String(([o_orderkey] Mod 5) + 1, \"*\") AS rep,",
      "  DateSerial(Year([o_orderdate]), Month([o_orderdate]) + 1, 0)" +
        " AS eom,",
      "  DateSerial(Year([o_orderdate]), 14, 2) AS ds2,",
      "  TimeSerial([o_orderkey] Mod 30, -15, 30) AS ts,",
      "  MonthName(Month([o_orderdate])) AS mn,",
      "  MonthName(Month([o_orderdate]), True) AS mna,",
      "  WeekdayName(Weekday([o_orderdate])) AS wdn,",
      "  WeekdayName(Weekday([o_orderdate]), True) AS wdna,",
      "  Atn(([o_orderkey] Mod 7) / 2) AS at,",
      "  FormatNumber([o_totalprice]) AS fn,",
      "  FormatCurrency([o_totalprice] - 150000) AS fc,",
      "  FormatPercent(([o_orderkey] Mod 8) / 16) AS fp,",
      "  FormatDateTime([o_orderdate], 2) AS fdt,",
      "  CDate(([o_orderkey] Mod 2000) + ([o_orderkey] Mod 4) / 4)" +
        " AS cd",
      "FROM orders",
      "WHERE [o_orderkey] Mod 19 = 0",
      "ORDER BY [o_orderkey]").mkString(" ")
    s.sql(graft.sources.JetSql.translate(saved))
      .select(col("o_orderkey"),
        col("rb").cast("double").as("rb"),
        col("rb2").cast("double").as("rb2"),
        col("hx"), col("vl"),
        col("ch"),
        col("ascv").cast("int").as("ascv"),
        col("rep"), col("eom"), col("ds2"),
        // tz-free rendering: Spark timestamps are UTC-aware, the
        // DuckDB literal is naive — compare the clock face itself
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("mn"), col("mna"), col("wdn"), col("wdna"),
        round(col("at"), 4).as("at"),
        col("fn"), col("fc"), col("fp"), col("fdt"),
        date_format(col("cd"), "yyyy-MM-dd HH:mm:ss").as("cd"))
      .orderBy(col("o_orderkey"))
  }

  /** Access `SELECT TOP n PERCENT ... ORDER BY` semantics — the Jet
    * idiom `TOP 10 PERCENT` every reference user has in saved queries:
    * the first ⌈n%·rows⌉ rows by the sort, AND every row TIED with the
    * boundary value (Access includes ties at the cut — a LIMIT is not
    * equivalent). Shape: one count, a TakeOrdered(k) boundary-value
    * aggregate, then a full-scan filter ≥ threshold — deterministic
    * regardless of storage order, unlike Access's own (which returns
    * whichever tied rows come first without the tie rule... the
    * documented TOP-PERCENT tie inclusion is the portable semantic).
    * At corpus scale the boundary would come from a KLL quantile probe
    * (registry operator) + the same exact filter; the 10%-of-rows
    * output is inherent to the ask. */
  val qJetTopPercent: QDef = QDef(
    "q_jet_top_percent",
    """WITH s AS (
      |  SELECT CAST(CEIL(0.1 * COUNT(*)) AS BIGINT) AS k FROM customer),
      |b AS (
      |  SELECT MIN(c_acctbal) AS thr FROM (
      |    SELECT c_acctbal FROM customer
      |    ORDER BY c_acctbal DESC LIMIT (SELECT k FROM s)))
      |SELECT c_custkey, c_acctbal
      |FROM customer, b WHERE c_acctbal >= thr
      |ORDER BY c_acctbal DESC, c_custkey""".stripMargin) { (s, d) =>
    val c = customer(s, d)
    val k = math.ceil(0.1 * c.count()).toLong
    // limit() takes an Int; past ~21 G rows the TOP-PERCENT prefix
    // itself no longer fits the demo form — the KLL-quantile boundary
    // path (q_kll_quantiles) is the corpus-scale formulation
    require(k <= Int.MaxValue,
      s"q_jet_top_percent: 10% prefix is $k rows — use the KLL " +
        "quantile boundary instead of TakeOrdered at this scale")
    val thr = c.select(col("c_acctbal"))
      .orderBy(col("c_acctbal").desc)
      .limit(k.toInt)
      .agg(min(col("c_acctbal")).as("thr"))
    c.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") >= col("thr"))
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
  }

  /** Tie-faithful plain `TOP n` — the translated saved-query form with
    * the cut INSIDE a boundary tie group: nation ordered by its (tied)
    * region key, TOP 7 → Access returns the WHOLE rank-6 tie group
    * (10 rows, regions 0 and 1), where a LIMIT would cut at 7. With no
    * uniqueKeys declared for the ORDER BY prefix the translator emits
    * the RANK() ≤ n windowed form, and the oracle recomputes the same
    * cut in DuckDB — the rewrite's OUTPUT sits under the hash gate,
    * not just its text. The deterministic presentation order is added
    * OUTSIDE the translated statement: putting n_name into the Jet
    * ORDER BY would move the cut off the tie group. */
  val qJetTopTies: QDef = QDef(
    "q_jet_top_ties",
    """SELECT n_regionkey, n_name FROM (
      |  SELECT n_regionkey, n_name,
      |    rank() OVER (ORDER BY n_regionkey) AS rk
      |  FROM nation) t WHERE rk <= 7
      |ORDER BY n_regionkey, n_name""".stripMargin) { (s, d) =>
    nation(s, d).createOrReplaceTempView("nation")
    val saved = "SELECT TOP 7 [n_regionkey], [n_name] FROM nation " +
      "ORDER BY [n_regionkey]"
    s.sql(graft.sources.JetSql.translate(saved))
      .orderBy(col("n_regionkey"), col("n_name"))
  }

  /** Multi-table DISTINCTROW, round-11 subset translation: output
    * columns all from `nation` (its unique key declared but NOT in
    * the output), joined to `customer` purely as a filter — the
    * Access-designer shape. The translator emits the
    * GROUP BY output+key form; the oracle states the SEMANTICS
    * independently as an EXISTS semi-join (one row per nation RECORD
    * with ≥ 1 customer), so the rewrite's row multiset — not its
    * text — sits under the hash gate. Deterministic presentation
    * order added OUTSIDE the translated statement. */
  val qJetDistinctrow: QDef = QDef(
    "q_jet_distinctrow",
    """SELECT n_name, n_regionkey FROM nation n
      |WHERE EXISTS (SELECT 1 FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey)
      |ORDER BY n_name, n_regionkey""".stripMargin) { (s, d) =>
    nation(s, d).createOrReplaceTempView("nation")
    customer(s, d).createOrReplaceTempView("customer")
    val saved = "SELECT DISTINCTROW [nation].[n_name], " +
      "[nation].[n_regionkey] FROM nation INNER JOIN customer " +
      "ON [nation].[n_nationkey] = [customer].[c_nationkey]"
    s.sql(graft.sources.JetSql.translate(saved, Map.empty,
      Map("nation" -> Seq(Set("n_nationkey")))))
      .orderBy(col("n_name"), col("n_regionkey"))
  }

  val defs: Seq[QDef] = Seq(
    qSchemaIntrospect, qEtlNormalize, qCastDecimal, qScanCsv, qScanJson,
    qScanOrc, qScanXml, qScanJetCsv, qScanJetMdb, qScanAccdb,
    qScanAccdbComplex, qScanAccdbMvf, qScanJet3,
    qTryFuncs,
    qSnapshotDiff,
    qProfileTable,
    qTableChecksum, qCdcApply, qMigrationDdl, qMigrationConstraints,
    qJetSqlSaved, qJetSqlSaved2, qJetSqlSaved3, qJetSqlCrosstab,
    qJetSqlParams,
    qJetSqlDateFuncs, qJetSqlScalarEdges, qJetSqlViews, qJetSqlFormat,
    qJetSqlFormatNamed, qJetSqlVbaFuncs,
    qJetSqlDomainAgg,
    qJetTopPercent, qJetTopTies, qJetDistinctrow)
}
