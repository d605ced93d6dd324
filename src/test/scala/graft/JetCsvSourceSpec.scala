package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The jetcsv DataSource V2 (Access-export directory → typed
  * DataFrame): sidecar-driven schema with Jet conversions, per-file
  * partitions, column pruning, and reader-side filter skipping that is
  * reported pushed but also left residual (Spark re-applies — the
  * reader can only ever REMOVE rows the filter would remove anyway).
  */
class JetCsvSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("jetcsv")
    Files.writeString(d.resolve("schema.jet"),
      """id:long
        |name:text
        |balance:currency
        |active:yesno
        |joined:datetime
        |score:double
        |""".stripMargin)
    Files.writeString(d.resolve("part-0.csv"),
      """1,"Smith, John",1234.5,−placeholder−
        |""".stripMargin
        .replace("1234.5,−placeholder−",
          "1234.5,-1,2024-03-01 10:30:00,87.25"))
    Files.writeString(d.resolve("part-1.csv"),
      """2,"Quote ""Q"" Co",-7.0001,0,2024-03-02 00:00:00,41.5
        |3,,0,0,,
        |""".stripMargin)
    d
  }

  private def read(): DataFrame =
    spark.read.format("jetcsv").load(dir.toString)

  test("sidecar schema maps Jet types to the SURVEY §1.2 Spark types") {
    assert(read().schema == StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("balance", DecimalType(19, 4)),
      StructField("active", BooleanType),
      StructField("joined", TimestampType),
      StructField("score", DoubleType))))
  }

  test("values convert with Jet semantics: -1 is true, empty is NULL, " +
    "currency is exact DECIMAL(19,4), quoted CSV parses") {
    val rows = read().orderBy("id").collect()
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getInt(0) == 1 && r1.getString(1) == "Smith, John")
    assert(r1.getDecimal(2) ==
      new java.math.BigDecimal("1234.5000"))
    assert(r1.getBoolean(3))
    assert(r1.getTimestamp(4).toInstant ==
      java.time.Instant.parse("2024-03-01T10:30:00Z"))
    assert(rows(1).getString(1) == "Quote \"Q\" Co")
    assert(rows(1).getDecimal(2) ==
      new java.math.BigDecimal("-7.0001"))
    assert(!rows(1).getBoolean(3))
    val r3 = rows(2)
    assert(r3.isNullAt(1) && r3.isNullAt(4) && r3.isNullAt(5))
  }

  test("one partition per part file") {
    assert(read().rdd.getNumPartitions == 2)
  }

  test("column pruning reaches the scan (ReadSchema shrinks)") {
    val df = read().select("id", "score")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("id") && !plan.contains("balance"),
      s"expected pruned scan:\n$plan")
    assert(df.collect().map(_.getInt(0)).sorted.sameElements(Array(1, 2, 3)))
  }

  test("comparison filters are reported pushed and results stay exact") {
    val df = read().filter("score > 50.0")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThan(score,50.0)"),
      s"filter not pushed:\n$plan")
    // row with NULL score must not surface (reader + residual agree)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("IS NULL / IS NOT NULL evaluate correctly through the reader") {
    assert(read().filter("name IS NULL").collect()
      .map(_.getInt(0)).toSeq == Seq(3))
    assert(read().filter("name IS NOT NULL").count() == 2)
  }

  test("write path round-trips: df -> jetcsv table -> df, sidecar " +
    "regenerated, values identical") {
    import spark.implicits._
    val out = Files.createTempDirectory("jetcsv_w").toString
    val src = Seq(
      (1, "plain", true, 12.5, "2024-05-01 08:00:00"),
      (2, "comma, quoted \"x\"", false, -0.25, "2024-05-02 23:59:59"),
      (3, null.asInstanceOf[String], true, 0.0, null)
    ).toDF("id", "name", "flag", "score", "t")
      .withColumn("t",
        org.apache.spark.sql.functions.col("t").cast("timestamp"))
      .withColumn("bal", org.apache.spark.sql.functions
        .col("score").cast("decimal(19,4)"))
    src.write.format("jetcsv").mode("append").save(out)
    val back = spark.read.format("jetcsv").load(out)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = src.orderBy("id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("overwrite replaces the table atomically at commit; append adds") {
    import spark.implicits._
    val out = Files.createTempDirectory("jetcsv_ow").toString
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.format("jetcsv").mode("append").save(out)
    Seq((3, "c")).toDF("id", "v")
      .write.format("jetcsv").mode("append").save(out)
    assert(spark.read.format("jetcsv").load(out).count() == 3)
    Seq((9, "z")).toDF("id", "v")
      .write.format("jetcsv").mode("overwrite").save(out)
    val rows = spark.read.format("jetcsv").load(out).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(9))
    // no staging residue
    val residue = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.startsWith(".staging"))
    assert(residue.isEmpty, residue.mkString(","))
  }

  test("BIGINT round-trips as the ACE Large Number sidecar type " +
    "(r12 — the jetmdb COMPLEX/DATEXT escape route must not " +
    "dead-end); arrays still reject at plan time") {
    import spark.implicits._
    val out = Files.createTempDirectory("jetcsv_big").toString
    Seq((9007199254740993L, "a"), (-1L, "b"))
      .toDF("big", "v")
      .write.format("jetcsv").mode("append").save(out)
    val back = spark.read.format("jetcsv").load(out)
    assert(back.schema("big").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(back.orderBy("big").collect().map(_.getLong(0)).toSeq ==
      Seq(-1L, 9007199254740993L))
    val e = intercept[Exception] {
      Seq((Seq(1, 2), "a")).toDF("xs", "v")
        .write.format("jetcsv").mode("append")
        .save(Files.createTempDirectory("jetcsv_rej").toString)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("no Jet rendering")), e.toString)
  }
}
