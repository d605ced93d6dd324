package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Access/Jet type system mapped onto Spark `DataType`s
  * (SURVEY.md §1.2) — the typed replacement for the reference's
  * `mdb-schema ... postgres` DDL-text stage.
  *
  * The mapping is a TOTAL function (every Jet type has exactly one Spark
  * rendering; JetTypesSpec property-tests totality and the semantic
  * corners: Byte widens to ShortType because Jet Byte is unsigned
  * [128..255 would overflow Spark's signed ByteType], Currency is
  * int64-scaled-1e-4 → DecimalType(19,4), Yes/No stores -1 for true).
  */
object JetTypes {

  sealed abstract class JetType(val name: String)
  case object YesNo extends JetType("yesno")
  case object JetByte extends JetType("byte")
  case object JetInteger extends JetType("integer") // int16
  case object LongInteger extends JetType("long") // int32, AutoNumber
  case object Single extends JetType("single")
  case object JetDouble extends JetType("double")
  case object Currency extends JetType("currency")
  final case class Numeric(p: Int, s: Int) extends JetType("numeric")
  case object DateTime extends JetType("datetime")
  case object ShortText extends JetType("text")
  case object Memo extends JetType("memo")
  case object OleObject extends JetType("ole")
  case object Hyperlink extends JetType("hyperlink")
  case object ReplicationId extends JetType("guid")
  /** ACE 2016 "Large Number" (r12): little-endian int64, the one new
    * SCALAR storage type the `.accdb` era added. */
  case object BigNumber extends JetType("bignumber")
  /** ACE COMPLEX column (Access 2007+ attachment / multi-valued /
    * version-history fields, r13): the main row stores a u32
    * complex-value key; the VALUES live in a hidden flat side table
    * (one row per element, keyed by that u32). `payload` is the flat
    * table's value-column schema — (FileName, FileType, FileData, …)
    * for attachments, a single (Value, t) for multi-valued fields —
    * so the Spark rendering is `ArrayType(StructType(payload))`,
    * exactly SURVEY §1.2's mapping. The format layer emits this with
    * an EMPTY payload (the flat schema needs the MSysComplexColumns
    * catalog); the source layer resolves it before building the
    * Spark schema. */
  final case class ComplexValues(payload: Seq[(String, JetType)])
    extends JetType("complex")
  /** ACE "Date/Time Extended" (Access 2019+, r13): SQL datetime2-
    * range timestamp, 100 ns resolution, year 1..9999. Maps to Spark
    * TimestampType (microseconds — the 100 ns fraction truncates; a
    * lossless rendering would need a decimal column, and 1 µs is
    * already beyond Access's own classic Date/Time precision). */
  case object DateTimeExtended extends JetType("datext")

  val all: Seq[JetType] = Seq(
    YesNo, JetByte, JetInteger, LongInteger, Single, JetDouble, Currency,
    Numeric(28, 6), DateTime, ShortText, Memo, OleObject, Hyperlink,
    ReplicationId, BigNumber, DateTimeExtended)
  // ComplexValues is deliberately NOT in `all`: it is the one type
  // with no scalar DDL rendering (toPostgres throws by design), and
  // `all` feeds the totality property tests for the scalar surface

  /** Jet → Spark type (total). */
  def toSpark(t: JetType): DataType = t match {
    case YesNo => BooleanType
    case JetByte => ShortType // unsigned uint8: ByteType loses 128..255
    case JetInteger => ShortType
    case LongInteger => IntegerType
    case Single => FloatType
    case JetDouble => DoubleType
    case Currency => DecimalType(19, 4)
    case Numeric(p, s) => DecimalType(p, s)
    case DateTime => TimestampType // no TZ in Jet -> session UTC
    case ShortText | Memo | Hyperlink => StringType
    case OleObject => BinaryType // -> multimodal column (§2.9)
    case ReplicationId => StringType // canonical 36-char GUID
    case BigNumber => LongType
    // a single payload column literally named "Value" IS Access's
    // simple multi-valued field (the designer UI creates exactly this
    // flat shape) — render it as array<scalar> so a write of
    // array<scalar> round-trips to itself (r14); attachments and
    // hand-built multi-column payloads keep the array<struct> shape.
    // containsNull = TRUE: the flat table's Value column is nullable
    // (a file written by another tool can legally store a null
    // element), and declaring false over data that can violate it
    // would let codegen elide null checks and read garbage — the
    // r14 review wave caught exactly that. Our own writer still
    // REJECTS null elements loudly, it just doesn't promise other
    // writers did.
    case ComplexValues(Seq(("Value", pt))) =>
      ArrayType(toSpark(pt), containsNull = true)
    case ComplexValues(payload) => ArrayType(StructType(payload.map {
      case (n, pt) => StructField(n, toSpark(pt), nullable = true)
    }), containsNull = false)
    case DateTimeExtended => TimestampType // truncated to micros
  }

  /** Ingest-side value normalization for the Jet encodings that don't
    * map 1:1 — applied to a raw (text/JDBC) column during migration. */
  def ingestCast(c: Column, t: JetType): Column = t match {
    // Jet Yes/No stores -1=true, 0=false
    case YesNo => (c.cast("int") =!= 0).as(c.toString)
    // Currency arrives as int64 scaled by 1e-4 from raw Jet pages
    case Currency => (c.cast("decimal(19,0)") / 10000).cast("decimal(19,4)")
    case other => c.cast(toSpark(other))
  }

  /** PostgreSQL DDL type the reference's schema translation emits
    * (mdbtools `mdb-schema ... postgres` canonical mapping). */
  def toPostgres(t: JetType): String = t match {
    case YesNo => "BOOL"
    case JetByte | JetInteger => "SMALLINT"
    case LongInteger => "INTEGER"
    case Single => "REAL"
    case JetDouble => "DOUBLE PRECISION"
    case Currency => "NUMERIC(19,4)"
    case Numeric(p, s) => s"NUMERIC($p,$s)"
    case DateTime => "TIMESTAMP"
    case ShortText => "VARCHAR(255)"
    case Memo | Hyperlink => "TEXT"
    case OleObject => "BYTEA"
    case ReplicationId => "UUID"
    case BigNumber => "BIGINT"
    // Date/Time Extended is EXACTLY Postgres timestamp territory
    // (datetime2 range; Postgres stores micros, same truncation as
    // the Spark mapping)
    case DateTimeExtended => "TIMESTAMP"
    // a complex column has no scalar DDL rendering — the honest
    // migration is a CHILD TABLE (it already IS one in the .accdb);
    // rejecting here keeps the JDBC boundary loud, the Spark-side
    // read of the same column works (ArrayType)
    case ComplexValues(_) => throw new UnsupportedOperationException(
      "jet: COMPLEX (attachment/multi-valued) column has no scalar " +
        "SQL type — migrate the hidden flat table as its own child " +
        "table, or explode the array column Spark-side first")
  }

  /** Column-name sanitization for the target system: lower-case,
    * non-alphanumerics to underscores, deduped underscores — what every
    * mdb→SQL migration does to Access's free-form column names. */
  def sanitizeName(raw: String): String = {
    val s = raw.trim.toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    if (s.isEmpty) "col" else if (s.head.isDigit) s"c_$s" else s
  }

  /** Apply a Jet schema (name → type) to a raw stringly DataFrame:
    * sanitize names, cast values, in one declarative pass. */
  def applyJetSchema(df: DataFrame, schema: Seq[(String, JetType)])
      : DataFrame =
    df.select(schema.map { case (name, t) =>
      ingestCast(col(name), t).as(sanitizeName(name))
    }: _*)
}
