package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JetTypes
import graft.sources.JetTypes._

/** Property tests for the Jet → Spark type mapping (SURVEY.md §5.3),
  * using scalacheck directly (no scalatestplus bridge offline). */
class JetTypesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  test("toSpark is total over every Jet type") {
    JetTypes.all.foreach(t => assert(toSpark(t) != null))
  }

  test("numeric mapping preserves precision/scale (property)") {
    check(Prop.forAll(Gen.choose(1, 38), Gen.choose(0, 10)) { (p0, s0) =>
      val p = math.max(p0, s0 + 1)
      toSpark(Numeric(p, s0)) == DecimalType(p, s0)
    })
  }

  test("Currency round-trips at scale 4 from raw int64 (property)") {
    // Jet stores Currency as int64 scaled by 1e-4; sample a spread of
    // magnitudes through the actual Spark cast path
    val raws = Seq(-1000000000L, -12345L, -1L, 0L, 1L, 9999L, 10000L,
      12345678L, 999999999999L)
    val df = raws.map(_.toString).toDF("cur")
    val out = df.select(ingestCast($"cur", Currency).as("c"))
      .collect().map(_.getDecimal(0))
    raws.zip(out).foreach { case (raw, got) =>
      assert(got == new java.math.BigDecimal(raw).movePointLeft(4)
        .setScale(4), s"raw=$raw")
    }
  }

  test("Yes/No maps -1 (and any nonzero) to true, 0 to false") {
    val df = Seq("-1", "0", "1").toDF("b")
    val out = df.select(ingestCast($"b", YesNo).as("v"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(out == Seq(true, false, true))
  }

  test("Byte maps to ShortType (unsigned 128..255 survives)") {
    assert(toSpark(JetByte) == ShortType)
    val df = Seq("255").toDF("x")
    assert(df.select(ingestCast($"x", JetByte).as("v"))
      .collect()(0).getShort(0) == 255)
  }

  test("sanitizeName produces valid SQL identifiers (property)") {
    check(Prop.forAll(Gen.alphaNumStr,
      Gen.oneOf(" ", "-", "#", "/", "(")) { (s, sep) =>
      sanitizeName(s"My$sep$s").matches("[a-z][a-z0-9_]*")
    })
    assert(sanitizeName("Order Date") == "order_date")
    assert(sanitizeName("2ndCol") == "c_2ndcol")
    assert(sanitizeName("  ") == "col")
  }

  test("applyJetSchema sanitizes + casts in one pass") {
    val raw = Seq(("1", "-1", "12345678", "2024-01-02 03:04:05"))
      .toDF("ID Number", "Is Active", "Unit Price", "Created At")
    val out = JetTypes.applyJetSchema(raw, Seq(
      "ID Number" -> LongInteger,
      "Is Active" -> YesNo,
      "Unit Price" -> Currency,
      "Created At" -> DateTime))
    assert(out.schema.map(_.name) ==
      Seq("id_number", "is_active", "unit_price", "created_at"))
    assert(out.schema("unit_price").dataType == DecimalType(19, 4))
    val r = out.collect()(0)
    assert(r.getInt(0) == 1 && r.getBoolean(1)
      && r.getDecimal(2).toString == "1234.5678")
  }

  test("toPostgres covers every type with a DDL rendering") {
    JetTypes.all.foreach(t => assert(toPostgres(t).nonEmpty))
  }
}
