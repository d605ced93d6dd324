package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MigrationPipeline
import graft.etl.MigrationPipeline.{ParquetSink, TableSpec}
import graft.sources.JetTypes._

/** End-to-end migration pipeline: enumerate → schema DDL → normalize →
  * bulk load → verify counts (SURVEY.md §3.1 rendered in Spark). */
class MigrationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private val specs = Seq(
    TableSpec(
      "Customer List",
      _ => Seq(
        ("1", "-1", "12500", "Ann Smith"),
        ("2", "0", "990000", "Bo Chen")).toDF(
        "Customer ID", "Is Active", "Credit Limit", "Full Name"),
      Seq(
        "Customer ID" -> LongInteger,
        "Is Active" -> YesNo,
        "Credit Limit" -> Currency,
        "Full Name" -> ShortText)),
    TableSpec(
      "Order#Log",
      _ => Seq(("10", "2024-02-29 12:00:00")).toDF("Order ID", "Placed At"),
      Seq("Order ID" -> LongInteger, "Placed At" -> DateTime)))

  test("ddl renders sanitized Postgres CREATE TABLE statements") {
    val d = MigrationPipeline.ddl(specs.head)
    assert(d.startsWith("CREATE TABLE customer_list ("))
    assert(d.contains("customer_id INTEGER"))
    assert(d.contains("is_active BOOL"))
    assert(d.contains("credit_limit NUMERIC(19,4)"))
    assert(d.contains("full_name VARCHAR(255)"))
  }

  test("migrate loads into a real JDBC target (embedded Derby)") {
    val dbDir = Files.createTempDirectory("graft_derby_mig").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val counts = MigrationPipeline.migrate(
      spark, specs.take(1),
      MigrationPipeline.JdbcSink(url),
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    assert(counts == Map("Customer List" -> 2L))
    val back = graft.sources.JdbcConnector.read(
      spark, url, "customer_list",
      props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    assert(back.count() == 2L)
    assert(back.columns.toSeq ==
      Seq("customer_id", "is_active", "credit_limit", "full_name"))
  }

  test("migrate normalizes and loads every table, verified by count") {
    val out = Files.createTempDirectory("graft_migrate").toString
    val counts =
      MigrationPipeline.migrate(spark, specs, ParquetSink(out))
    assert(counts == Map("Customer List" -> 2L, "Order#Log" -> 1L))
    val loaded = spark.read.parquet(s"$out/customer_list.parquet")
      .orderBy("customer_id").collect()
    assert(loaded(0).getBoolean(1)) // -1 -> true
    assert(loaded(0).getDecimal(2).toString == "1.2500") // 12500/1e4
  }
}
