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

  val all: Seq[JetType] = Seq(
    YesNo, JetByte, JetInteger, LongInteger, Single, JetDouble, Currency,
    Numeric(28, 6), DateTime, ShortText, Memo, OleObject, Hyperlink,
    ReplicationId, BigNumber)

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
