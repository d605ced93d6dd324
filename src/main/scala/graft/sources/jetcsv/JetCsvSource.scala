package graft.sources.jetcsv

import java.time.LocalDateTime
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter
import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.JetTypes
import graft.sources.JetTypes._

/** DataSource V2 reader for an Access table export directory — the
  * Spark-native rendering of the reference's `mdb-export` stage: a
  * directory holding `schema.jet` (one `column:jettype` line per
  * column, the `mdb-schema` analog) plus any number of `*.csv` part
  * files (the row stream).
  *
  * Engineering the mandate asks of a source, all live here:
  *   - **typed schema from the sidecar** — Jet types land as the
  *     SURVEY §1.2 Spark types via [[JetTypes.toSpark]] (Yes/No `-1`
  *     → true, Currency → DECIMAL(19,4), Date/Time → UTC timestamp);
  *   - **column pruning** ([[SupportsPushDownRequiredColumns]]): only
  *     requested columns are CONVERTED (parsing still tokenizes the
  *     line, conversion is the dominant cost) and the scan's
  *     ReadSchema shrinks, visible in `.explain`;
  *   - **filter pushdown** ([[SupportsPushDownFilters]]): comparison /
  *     null-test filters are evaluated inside the reader to skip rows
  *     before they reach Spark. Filters are reported pushed AND kept
  *     as residuals (returned back to Spark), so engine semantics
  *     never depend on the reader's filter evaluation being perfect —
  *     the honest contract for a text source with no statistics;
  *   - **parallelism**: one [[InputPartition]] per part file, the unit
  *     a 1000-executor cluster schedules independently.
  *
  * Registered as `format("jetcsv")` via DataSourceRegister.
  */
class JetCsvSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "jetcsv"

  // writes pass the DataFrame's schema straight through (a brand-new
  // table directory has no sidecar to infer from yet)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JetCsv.readSidecar(JetCsv.dir(options))._2

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val dir = properties.get("path")
    require(dir != null, "jetcsv: a path must be supplied")
    JetCsvTable(dir, schema)
  }
}

private[jetcsv] object JetCsv {

  def dir(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "jetcsv: a path must be supplied")
    p
  }

  /** Parse `schema.jet`: `name:jettype` per line (`numeric:p:s` for
    * scaled numerics). Returns the Jet column types and the Spark
    * schema. */
  def readSidecar(dir: String): (Seq[(String, JetType)], StructType) = {
    val fs = hadoopFs(dir)
    val sidecar = new Path(dir, "schema.jet")
    require(fs.exists(sidecar), s"jetcsv: missing $sidecar")
    val in = fs.open(sidecar)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val cols = parseSidecar(text)
    val schema = StructType(cols.map { case (n, t) =>
      StructField(n, JetTypes.toSpark(t), nullable = true)
    })
    (cols, schema)
  }

  def parseSidecar(text: String): Seq[(String, JetType)] =
    text.linesIterator.map(_.trim).filter(_.nonEmpty).map { l =>
      val parts = l.split(":")
      val jt: JetType = parts(1).toLowerCase match {
        case "yesno" => YesNo
        case "byte" => JetByte
        case "integer" => JetInteger
        case "long" => LongInteger
        case "single" => Single
        case "double" => JetDouble
        case "currency" => Currency
        case "numeric" => Numeric(parts(2).toInt, parts(3).toInt)
        case "datetime" => DateTime
        case "text" => ShortText
        case "memo" => Memo
        case "hyperlink" => Hyperlink
        case "guid" => ReplicationId
        case "bignumber" => BigNumber // ACE 2016 Large Number (r12)
        case other =>
          throw new IllegalArgumentException(s"jetcsv: unknown type $other")
      }
      parts(0) -> jt
    }.toSeq

  def listCsvFiles(dir: String): Seq[String] = {
    val fs = hadoopFs(dir)
    fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".csv"))
      .map(_.getPath.toString).sorted
  }

  def hadoopFs(dir: String) =
    new Path(dir).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)

  /** Minimal RFC-4180 line split: quoted fields, doubled quotes. */
  def splitCsv(line: String): Array[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') {
            cur.append('"'); i += 1
          } else inQuotes = false
        } else cur.append(c)
      } else c match {
        case '"' => inQuotes = true
        case ',' => out += cur.result(); cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.result()
    out.toArray
  }

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSS]")

  /** One raw CSV token → Catalyst value under the column's Jet type.
    * Empty string = NULL (mdb-export's rendering of missing). */
  def convert(raw: String, t: JetType): Any =
    if (raw == null || raw.isEmpty) null
    else t match {
      case YesNo => raw != "0" // Jet stores -1 for true
      case JetByte | JetInteger => raw.toShort
      case LongInteger => raw.toInt
      case Single => raw.toFloat
      case JetDouble => raw.toDouble
      case Currency =>
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(raw).setScale(4), 19, 4)
      case Numeric(p, s) =>
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(raw).setScale(s), p, s)
      case DateTime =>
        val ldt = LocalDateTime.parse(raw, tsFmt)
        ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case ShortText | Memo | Hyperlink | ReplicationId =>
        UTF8String.fromString(raw)
      case OleObject =>
        java.util.Base64.getDecoder.decode(raw)
      case BigNumber => raw.toLong // ACE 2016 Large Number (r12)
      // the jetcsv dialect mirrors mdb-export, which renders neither
      // ACE complex columns (it has no flat-table join) nor Date/Time
      // Extended — a schema naming them is a schema error, not data
      case ComplexValues(_) | DateTimeExtended =>
        throw new UnsupportedOperationException(
          s"jetcsv: type '${t.name}' has no mdb-export CSV " +
            "rendering — read the .accdb directly (jetmdb)")
    }
}

private[jetcsv] final case class JetCsvTable(
    dir: String, tableSchema: StructType)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"jetcsv:$dir"
  override def schema(): StructType = tableSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new JetCsvScanBuilder(dir, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JetCsvWriteBuilder(dir, info)
}

private[jetcsv] final class JetCsvScanBuilder(
    dir: String, fullSchema: StructType)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order; drop unrequested columns
    required = StructType(fullSchema.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** Accept simple comparisons/null-tests for reader-side skipping;
    * return ALL filters as residual so Spark re-applies them (reader
    * evaluation is an optimization, never the source of truth). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(JetCsvFilters.supported)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = JetCsvScan(dir, fullSchema, required, pushed)
}

private[jetcsv] final case class JetCsvScan(
    dir: String,
    fullSchema: StructType,
    required: StructType,
    filters: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"jetcsv $dir, PushedFilters: ${filters.mkString("[", ", ", "]")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    JetCsv.listCsvFiles(dir).map(f =>
      JetCsvInputPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    // hadoop conf captured ON THE DRIVER and shipped serializably —
    // executors must never touch SparkSession.active
    JetCsvReaderFactory(dir, required, filters,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

private[jetcsv] final case class JetCsvInputPartition(file: String)
  extends InputPartition

private[jetcsv] final case class JetCsvReaderFactory(
    dir: String,
    required: StructType,
    filters: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[JetCsvInputPartition].file
    new JetCsvPartitionReader(dir, file, required, filters, conf.value)
  }
}

private[jetcsv] final class JetCsvPartitionReader(
    dir: String,
    file: String,
    required: StructType,
    filters: Array[Filter],
    hconf: org.apache.hadoop.conf.Configuration)
  extends PartitionReader[InternalRow] {

  private val fs = new Path(dir).getFileSystem(hconf)

  // sidecar re-read on the executor: cheap (one tiny file) and keeps
  // the partition descriptor free of non-serializable state
  private val sidecarCols: Seq[(String, JetTypes.JetType)] = {
    val in = fs.open(new Path(dir, "schema.jet"))
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    JetCsv.parseSidecar(text)
  }
  private val jetTypes = sidecarCols.toMap
  private val allNames = sidecarCols.map(_._1)
  private val colIdx: Array[Int] =
    required.fieldNames.map(allNames.indexOf)
  private val colType: Array[JetTypes.JetType] =
    required.fieldNames.map(jetTypes)
  private val evals =
    filters.map(JetCsvFilters.compile(_, required))

  private val in = fs.open(new Path(file))
  private val lines =
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  private var current: GenericInternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null && lines.hasNext) {
      val raw = lines.next()
      if (raw.nonEmpty) {
        val tokens = JetCsv.splitCsv(raw)
        val values = new Array[Any](colIdx.length)
        var i = 0
        while (i < colIdx.length) {
          val src = colIdx(i)
          values(i) =
            if (src < 0 || src >= tokens.length) null
            else JetCsv.convert(tokens(src), colType(i))
          i += 1
        }
        if (evals.forall(_(values)))
          current = new GenericInternalRow(values)
      }
    }
    current != null
  }

  override def get(): InternalRow = current

  override def close(): Unit = in.close()
}

/** Reader-side evaluation of V1 filters over the PRUNED row (shared
  * with the jetmdb binary source — same residual-filter contract). */
private[sources] object JetCsvFilters {

  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
        _: LessThan | _: LessThanOrEqual | _: IsNull | _: IsNotNull =>
      true
    case _ => false
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: UTF8String, y) => Some(x.toString.compareTo(y.toString))
    // Spark Decimal internal values (Currency/NUMERIC columns) against
    // the java BigDecimal literals V1 filters carry (Catalyst's
    // toScala conversion always yields java.math.BigDecimal) — NOT
    // java Numbers, so the generic case below never matches them
    case (x: Decimal, y: java.math.BigDecimal) =>
      Some(x.toJavaBigDecimal.compareTo(y))
    case (x: Decimal, y: Number) =>
      Some(x.toJavaBigDecimal.compareTo(
        new java.math.BigDecimal(y.toString)))
    // DateTime columns hold epoch MICROS internally; filter literals
    // arrive as java.sql.Timestamp or (java8 datetime API) Instant.
    // No Jet type maps to DateType, so Date/LocalDate literals cannot
    // reach this source and are deliberately not handled here.
    case (x: java.lang.Long, y: java.sql.Timestamp) =>
      Some(java.lang.Long.compare(x,
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaTimestamp(y)))
    case (x: java.lang.Long, y: java.time.Instant) =>
      Some(java.lang.Long.compare(x,
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .instantToMicros(y)))
    case (x: Number, y: Number) =>
      Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
    case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
    case _ => None
  }

  /** filter → predicate over the PRUNED raw value array (evaluated
    * before row construction). Safety contract: every pushed filter is
    * ALSO returned as residual (pushFilters above), so the reader may
    * only skip a row it is CERTAIN fails the predicate. A non-null
    * value whose shape cmp() cannot compare therefore KEEPS the row
    * (`forall` — the residual FilterExec decides); only a NULL value
    * fails a comparison outright, which matches SQL semantics. The
    * pre-fix `exists` dropped incomparable matches silently — for a
    * Decimal or Timestamp column that meant every row. */
  def compile(f: Filter, schema: StructType): Array[Any] => Boolean = {
    def idx(name: String): Int = schema.fieldNames.indexOf(name)
    def value(arr: Array[Any], i: Int): Any =
      if (i < 0) null else arr(i)
    def test(i: Int, v: Any, ok: Int => Boolean): Array[Any] => Boolean =
      r => {
        val x = value(r, i)
        x != null && cmp(x, v).forall(ok)
      }
    f match {
      case EqualTo(c, v) => test(idx(c), v, _ == 0)
      case GreaterThan(c, v) => test(idx(c), v, _ > 0)
      case GreaterThanOrEqual(c, v) => test(idx(c), v, _ >= 0)
      case LessThan(c, v) => test(idx(c), v, _ < 0)
      case LessThanOrEqual(c, v) => test(idx(c), v, _ <= 0)
      case IsNull(c) =>
        val i = idx(c); r => i >= 0 && value(r, i) == null
      case IsNotNull(c) =>
        val i = idx(c); r => i >= 0 && value(r, i) != null
      case _ => _ => true
    }
  }
}
