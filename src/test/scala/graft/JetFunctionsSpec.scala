package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JetFunctions._

/** Access scalar idiom helpers: IIf / Nz / Switch / Jet LIKE dialect. */
class JetFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  test("iif and nz translate to CASE/COALESCE semantics") {
    val df = Seq((1, Some(5)), (2, None)).toDF("id", "v")
    val out = df.select(
      iif($"id" === 1, lit("one"), lit("other")).as("a"),
      nz($"v").as("b"),
      nz($"v", lit(-1)).as("c"))
      .collect()
    assert(out(0).getString(0) == "one" && out(1).getString(0) == "other")
    assert(out(0).getInt(1) == 5 && out(1).getInt(1) == 0)
    assert(out(1).getInt(2) == -1)
  }

  test("switchCase: first true wins, NULL when none match") {
    val df = Seq(5, 15, 50).toDF("x")
    val out = df.select(
      switchCase(
        ($"x" < 10, lit("small")),
        ($"x" < 20, lit("medium"))).as("c"))
      .collect()
    assert(out(0).getString(0) == "small")
    assert(out(1).getString(0) == "medium")
    assert(out(2).isNullAt(0))
  }

  test("jetLike maps */?/# wildcards") {
    val df = Seq("Customer#000042", "cat", "cut", "c9t").toDF("s")
    assert(df.filter(jetLike($"s", "Customer#*")).count() == 0) // # = digit
    assert(df.filter(jetLike($"s", "c?t")).count() == 3)
    assert(df.filter(jetLike($"s", "c#t")).count() == 1) // only c9t
    assert(df.filter(jetLike($"s", "C*")).count() == 1)
  }
}
