package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.RobustIngest

/** Malformed-record policies over a fixture with 3 good and 2 broken
  * rows (wrong arity / non-numeric field) — mdb-export-style damage. */
class RobustIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  private lazy val csvPath: String = {
    val dir = Files.createTempDirectory("robust_csv")
    val f = dir.resolve("part.csv")
    Files.writeString(f,
      """id,name,amount
        |1,alice,10.5
        |2,bob,not_a_number
        |3,carol,7.25
        |4,dave
        |5,erin,99.0
        |""".stripMargin)
    f.getParent.toString
  }

  test("quarantine keeps every row, isolates the broken ones") {
    val df = RobustIngest.quarantine(spark, schema, "csv", csvPath)
    val (clean, bad) = RobustIngest.splitQuarantine(df)
    assert(clean.count() == 3)
    assert(clean.select("id").collect().map(_.getLong(0)).sorted
      === Array(1L, 3L, 5L))
    val badRaw = bad.collect().map(_.getString(0))
    assert(badRaw.length == 2)
    assert(badRaw.exists(_.contains("not_a_number")))
    assert(badRaw.exists(_.startsWith("4,dave")))
  }

  test("dropMalformed discards exactly the broken rows") {
    val df = RobustIngest.dropMalformed(spark, schema, "csv", csvPath)
    // collect (all columns referenced), not count(): Spark judges
    // malformedness against referenced columns only, so a fully-pruned
    // COUNT(*) parses nothing and drops nothing
    assert(df.collect().length == 3)
  }

  test("failFast aborts on the first broken row") {
    intercept[org.apache.spark.SparkException] {
      RobustIngest.failFast(spark, schema, "csv", csvPath).collect()
    }
  }

  test("quarantine handles malformed JSON lines") {
    val dir = Files.createTempDirectory("robust_json")
    Files.writeString(dir.resolve("part.json"),
      """{"id": 1, "name": "alice", "amount": 10.5}
        |{"id": 2, "name": "bob", "amount":
        |{"id": 3, "name": "carol", "amount": 7.25}
        |""".stripMargin)
    val df = RobustIngest.quarantine(spark, schema, "json", dir.toString)
    val (clean, bad) = RobustIngest.splitQuarantine(df)
    assert(clean.count() == 2 && bad.count() == 1)
  }
}
