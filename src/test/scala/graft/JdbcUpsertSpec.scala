package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdbcConnector, TableLoader}

/** Incremental upsert semantics against embedded Derby (a real MERGE-
  * capable database, in-process — same offline strategy as the JDBC
  * round-trip spec): updates overwrite matched keys, inserts land new
  * keys, untouched rows survive. */
class JdbcUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("upsert merges delta into target (update + insert + untouched)") {
    val dbDir = java.nio.file.Files
      .createTempDirectory("graft_derby_up").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val base = TableLoader.nation(spark, "/root/testdata/sf0.001")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    JdbcConnector.write(base, url, "nation_up",
      mode = SaveMode.Overwrite, props = props)
    // delta: rename nation 0, add nation 99
    val delta = base.filter(col("n_nationkey") === 0)
      .withColumn("n_name", lit("RENAMED"))
      .unionByName(spark.range(1)
        .select(lit(99).cast("int").as("n_nationkey"),
          lit("ATLANTIS").as("n_name"), lit(0).cast("int").as("n_regionkey")))
    JdbcConnector.upsert(delta, url, "nation_up",
      keyCols = Seq("n_nationkey"), props = props)
    val after = JdbcConnector.read(spark, url, "nation_up", props = props)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(after.size == base.count() + 1)
    assert(after(0) == "RENAMED")
    assert(after(99) == "ATLANTIS")
    // an untouched key keeps its original value
    val orig = base.filter(col("n_nationkey") === 5)
      .head().getString(1)
    assert(after(5) == orig)
    // re-running the same upsert is idempotent
    JdbcConnector.upsert(delta, url, "nation_up",
      keyCols = Seq("n_nationkey"), props = props)
    val again = JdbcConnector.read(spark, url, "nation_up", props = props)
    assert(again.count() == base.count() + 1)
  }
}
