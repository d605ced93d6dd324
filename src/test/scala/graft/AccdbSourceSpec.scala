package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.JetMdbFixture.{Col, Table}
import graft.sources.jetmdb.JetMdbFormat

/** ACE (`.accdb`, Access 2007+) read support (r12): the `jetmdb`
  * format auto-dispatches page-0 versions 0x02–0x05 (magic
  * "Standard ACE DB") through the Jet4 parser — ACE publicly shares
  * the 4096-byte-page TDEF/data/row geometry — with the ACE-era
  * BIGINT (Large Number, 0x13) decoded as LongType and the
  * non-portable ACE types (COMPLEX 0x12, extended date/time 0x14)
  * rejected with named escape routes. Fixtures come from the
  * independent test-side layout writer with an ACE header. */
class AccdbSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def tmpDb(name: String): String =
    Files.createTempDirectory("accdb").resolve(name).toString

  private val allTypes = Seq(
    Col("flag", 0x01), Col("b", 0x02), Col("i", 0x03), Col("l", 0x04),
    Col("big", 0x13), Col("price", 0x05), Col("f", 0x06),
    Col("d", 0x07), Col("ts", 0x08), Col("uid", 0x0F),
    Col("name", 0x0A))

  private val ts1 = 981173106000000L // 2001-02-03 04:05:06 UTC

  private def row(
      flag: Boolean, b: Int, i: Int, l: Int, big: Long, price: String,
      f: Float, d: Double, ts: Long, uid: String,
      name: String): Seq[Any] =
    Seq(java.lang.Boolean.valueOf(flag),
      java.lang.Short.valueOf(b.toShort),
      java.lang.Short.valueOf(i.toShort), Integer.valueOf(l),
      java.lang.Long.valueOf(big),
      if (price == null) null else new java.math.BigDecimal(price),
      java.lang.Float.valueOf(f), java.lang.Double.valueOf(d),
      java.lang.Long.valueOf(ts), uid, name)

  test("accdb auto-dispatch: every non-LOB type round-trips exactly, " +
    "including the ACE-only BIGINT Large Number, for versions " +
    "0x02 and 0x03") {
    for (ver <- Seq(0x02, 0x03)) {
      val path = tmpDb(s"t$ver.accdb")
      JetMdbFixture.write(path, Seq(Table("typed", allTypes, Seq(
        row(flag = true, 200, -12345, 7654321,
          // past Int range both ways: the value LongInteger cannot hold
          9007199254740993L, "19.9900", 1.5f, 2.25, ts1,
          "0102aabb-ccdd-eeff-0011-223344556677", "alice"),
        row(flag = false, 0, 42, -1, -1234567890123456789L, "-0.0001",
          -3.5f, 1e10, 0L,
          "00000000-0000-0000-0000-000000000001", "bob")))),
        aceVersion = ver)
      val df = spark.read.format("jetmdb")
        .option("table", "typed").load(path)
      assert(df.schema("big").dataType ==
        org.apache.spark.sql.types.LongType)
      val rows = df.orderBy(desc("flag")).collect()
      assert(rows.length == 2)
      val r0 = rows(0)
      assert(r0.getBoolean(0) && r0.getShort(1) == 200 &&
        r0.getShort(2) == -12345 && r0.getInt(3) == 7654321)
      assert(r0.getLong(4) == 9007199254740993L)
      assert(r0.getDecimal(5) == new java.math.BigDecimal("19.9900"))
      assert(r0.getFloat(6) == 1.5f && r0.getDouble(7) == 2.25)
      assert(r0.getTimestamp(8).toInstant.toEpochMilli == ts1 / 1000)
      assert(r0.getString(9) == "0102aabb-ccdd-eeff-0011-223344556677")
      assert(r0.getString(10) == "alice")
      val r1 = rows(1)
      assert(r1.getLong(4) == -1234567890123456789L)
    }
  }

  test("accdb BIGINT nulls round-trip; pruning and filters still " +
    "reach the reader") {
    val path = tmpDb("n.accdb")
    JetMdbFixture.write(path, Seq(Table("nully",
      Seq(Col("id", 0x04), Col("big", 0x13)),
      Seq(
        Seq(Integer.valueOf(1), java.lang.Long.valueOf(5L)),
        Seq(Integer.valueOf(2), null),
        Seq(Integer.valueOf(3),
          java.lang.Long.valueOf(Long.MaxValue - 5L))))),
      aceVersion = 0x04)
    val df = spark.read.format("jetmdb").option("table", "nully")
      .load(path)
    assert(df.filter(col("big").isNull).select("id")
      .collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(df.select(sum(col("big"))).collect()(0).getLong(0) ==
      Long.MaxValue)
  }

  test("accdb memo/OLE long values ride the shared Jet4 LVAL " +
    "machinery unchanged") {
    val longText = "ACE memo that must leave the row — " + ("x" * 600)
    val blob = Array.tabulate(700)(i => (i % 251).toByte)
    val path = tmpDb("lob.accdb")
    JetMdbFixture.write(path, Seq(Table("lobs",
      Seq(Col("id", 0x04), Col("body", 0x0C), Col("payload", 0x0B)),
      Seq(Seq(Integer.valueOf(1), longText, blob)),
      lvalCols = Set("body", "payload"))),
      aceVersion = 0x02)
    val r = spark.read.format("jetmdb").option("table", "lobs")
      .load(path).collect()(0)
    assert(r.getString(1) == longText)
    assert(r.getAs[Array[Byte]](2).toSeq == blob.toSeq)
  }

  test("ACE attachment column (COMPLEX) reads as array<struct<...>> " +
    "through the hidden flat table: values, pk ordering, empty-set " +
    "vs null keys, and explode all work") {
    val path = tmpDb("att.accdb")
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    val txt = Array.tabulate(500)(i => (i % 251).toByte) // LVAL-sized
    JetMdbFixture.write(path, Seq(
      Table("docs",
        Seq(Col("id", 0x04), Col("att", 0x12)),
        Seq(
          Seq(Integer.valueOf(1), Integer.valueOf(100)),
          Seq(Integer.valueOf(2), Integer.valueOf(200)), // no children
          Seq(Integer.valueOf(3), null)), // null key
        complexCols = Map("att" -> "docs_att_flat")),
      // flat side table: bookkeeping AutoNumber pk + type-0x12 key +
      // the attachment payload columns, inserted OUT of pk order so
      // the reader's insertion-order (pk) sort is observable
      Table("docs_att_flat",
        Seq(Col("pk", 0x04, auto = true), Col("fk", 0x12),
          Col("FileName", 0x0A), Col("FileType", 0x0A),
          Col("FileData", 0x0B)),
        Seq(
          Seq(Integer.valueOf(2), Integer.valueOf(100),
            "b.bin", "bin", txt),
          Seq(Integer.valueOf(1), Integer.valueOf(100),
            "a.png", "png", png)),
        system = true, lvalCols = Set("FileData"))),
      aceVersion = 0x02)
    val df = spark.read.format("jetmdb").option("table", "docs")
      .load(path)
    val at = df.schema("att").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    val st = at.elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSeq ==
      Seq("FileName", "FileType", "FileData"))
    assert(st("FileData").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val rows = df.orderBy(col("id")).collect()
    val a1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(a1.map(_.getString(0)) == Seq("a.png", "b.bin")) // pk order
    assert(a1(0).getAs[Array[Byte]]("FileData").toSeq == png.toSeq)
    assert(a1(1).getAs[Array[Byte]]("FileData").toSeq == txt.toSeq)
    assert(rows(1).getSeq[Any](1).isEmpty) // key with no children
    assert(rows(2).isNullAt(1)) // null key
    // the idiomatic downstream shape: explode into one row per file
    val ex = df.select(col("id"), explode(col("att")).as("f"))
      .select(col("id"), col("f.FileName"))
      .orderBy(col("id"), col("FileName")).collect()
    assert(ex.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a.png"), (1, "b.bin")))
    // pruning away the complex column must not touch the flat table
    assert(df.select("id").orderBy(col("id")).collect()
      .map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("ACE multi-valued field (COMPLEX, single Value payload) and " +
    "Date/Time Extended (0x14) round-trip; DATEXT is micros-exact " +
    "across the 0001 epoch") {
    val path = tmpDb("mvf.accdb")
    val t1 = 981173106123456L // 2001-02-03 04:05:06.123456 UTC
    val t2 = -30610224000000000L + 987L // 1000-01-01 + 987 µs
    JetMdbFixture.write(path, Seq(
      Table("tagged",
        Seq(Col("id", 0x04), Col("tags", 0x12), Col("dt", 0x14)),
        Seq(
          Seq(Integer.valueOf(1), Integer.valueOf(7),
            java.lang.Long.valueOf(t1)),
          Seq(Integer.valueOf(2), Integer.valueOf(8),
            java.lang.Long.valueOf(t2))),
        complexCols = Map("tags" -> "tagged_tags_flat")),
      Table("tagged_tags_flat",
        Seq(Col("pk", 0x04, auto = true), Col("fk", 0x12),
          Col("Value", 0x0A)),
        Seq(
          Seq(Integer.valueOf(1), Integer.valueOf(7), "red"),
          Seq(Integer.valueOf(2), Integer.valueOf(7), "blue"),
          Seq(Integer.valueOf(3), Integer.valueOf(8), "green")),
        system = true)),
      aceVersion = 0x03)
    val df = spark.read.format("jetmdb").option("table", "tagged")
      .load(path)
    assert(df.schema("dt").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // r14: a single payload column named "Value" IS Access's simple
    // multi-valued field — the reader unwraps it to array<scalar>
    // (r13 rendered array<struct<Value:string>>)
    // containsNull=true (r14 review): the flat Value column is
    // nullable, so the unwrapped element slot must be too
    assert(df.schema("tags").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = true))
    val rows = df.orderBy(col("id")).collect()
    assert(rows(0).getSeq[String](1) == Seq("red", "blue"))
    assert(rows(1).getSeq[String](1) == Seq("green"))
    // micros-exact timestamps, including pre-1970 / year-1000
    val micros = df.orderBy(col("id"))
      .select(expr("unix_micros(dt)"))
      .collect().map(_.getLong(0))
    assert(micros.toSeq == Seq(t1, t2))
    // the flat tables stay hidden from the user-table listing
    assert(graft.sources.jetmdb.JetMdbSource.listTables(path)
      .map(_._1) == Seq("tagged"))
  }

  test("ACE multi-valued WRITE (r14): array<int> and array<string> " +
    "round-trip identically through the auto-wrapped single-Value " +
    "complex machinery; an explicit named_struct('Value', x) write " +
    "reads back as the same array<scalar>") {
    val spark2 = spark
    import spark2.implicits._
    val path = tmpDb("mvw.accdb")
    val df = Seq(
      (1, Seq(10, 20, 30), Seq("a", "b")),
      (2, Seq.empty[Int], Seq("only")),
      (3, null.asInstanceOf[Seq[Int]], null.asInstanceOf[Seq[String]]))
      .toDF("id", "nums", "tags")
    df.write.format("jetmdb").option("table", "mv")
      .option("version", "ace").mode("overwrite").save(path)
    val back = spark.read.format("jetmdb").option("table", "mv")
      .load(path)
    import org.apache.spark.sql.types._
    assert(back.schema("nums").dataType ==
      ArrayType(IntegerType, containsNull = true))
    assert(back.schema("tags").dataType ==
      ArrayType(StringType, containsNull = true))
    val rows = back.orderBy(col("id")).collect()
    assert(rows(0).getSeq[Int](1) == Seq(10, 20, 30))
    assert(rows(0).getSeq[String](2) == Seq("a", "b"))
    assert(rows(1).getSeq[Int](1).isEmpty)
    assert(rows(1).getSeq[String](2) == Seq("only"))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    // the r13 manual recipe still works and converges to the SAME
    // on-disk shape — reading back yields array<scalar>, not the
    // wrapped struct
    val path2 = tmpDb("mvw2.accdb")
    Seq((1, Seq(7, 8))).toDF("id", "nums")
      .select(col("id"), expr(
        "transform(nums, x -> named_struct('Value', x))").as("nums"))
      .write.format("jetmdb").option("table", "mv")
      .option("version", "ace").mode("overwrite").save(path2)
    val back2 = spark.read.format("jetmdb").option("table", "mv")
      .load(path2)
    assert(back2.schema("nums").dataType ==
      ArrayType(IntegerType, containsNull = true))
    assert(back2.collect()(0).getSeq[Int](1) == Seq(7, 8))
  }

  test("ACE complex WRITE (r13): array<struct> round-trips through " +
    "the production writer and reader — element order, empty arrays, " +
    "null keys, binary payload; Jet4 and append reject") {
    val spark2 = spark
    import spark2.implicits._
    val path = tmpDb("cw.accdb")
    val df = Seq[(Int, Seq[(String, Array[Byte])])](
      (1, Seq(("a.png", Array[Byte](1, 2, 3)),
        ("b.bin", Array[Byte](9)))),
      (2, Seq.empty),
      (3, null)).toDF("id", "att")
      .select(col("id"),
        expr("transform(att, x -> named_struct(" +
          "'FileName', x._1, 'FileData', x._2))").as("att"))
    df.write.format("jetmdb").option("table", "docs")
      .option("version", "ace").mode("overwrite").save(path)
    val back = spark.read.format("jetmdb").option("table", "docs")
      .load(path).orderBy(col("id")).collect()
    val a1 = back(0).getSeq[org.apache.spark.sql.Row](1)
    assert(a1.map(_.getString(0)) == Seq("a.png", "b.bin"))
    assert(a1(0).getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3))
    assert(back(1).getSeq[Any](1).isEmpty) // empty array survives
    assert(back(2).isNullAt(1)) // null array survives
    // flat table is hidden from the user listing
    assert(graft.sources.jetmdb.JetMdbSource.listTables(path)
      .map(_._1) == Seq("docs"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // Jet4 target rejects with the ace escape route
    val e1 = intercept[Exception] {
      df.write.format("jetmdb").option("table", "docs")
        .mode("overwrite").save(tmpDb("cw.mdb"))
    }
    assert(msgs(e1).exists(_.contains("ace")), msgs(e1).mkString("|"))
    // append with a complex column rejects
    val e2 = intercept[Exception] {
      df.withColumnRenamed("att", "att2")
        .write.format("jetmdb").option("table", "docs2")
        .option("version", "ace").mode("append").save(path)
    }
    assert(msgs(e2).exists(_.contains("fresh")), msgs(e2).mkString("|"))
    // documented inline-only payload scope: an element whose payload
    // exceeds the page budget fails LOUDLY at write (the reader
    // additionally understands LVAL forms real Access writers emit;
    // this writer does not produce them)
    val big = Seq[(Int, Seq[(String, Array[Byte])])](
      (1, Seq(("huge.bin", Array.fill[Byte](5000)(1)))))
      .toDF("id", "att")
      .select(col("id"),
        expr("transform(att, x -> named_struct(" +
          "'FileName', x._1, 'FileData', x._2))").as("att"))
    val e3 = intercept[Exception] {
      big.write.format("jetmdb").option("table", "docs3")
        .option("version", "ace").mode("overwrite")
        .save(tmpDb("big.accdb"))
    }
    assert(msgs(e3).exists(_.contains("page capacity")),
      msgs(e3).mkString("|"))
  }

  test("ACE write with indexes + relationships + a complex column in " +
    "ONE file: every catalog page number lands where the readers " +
    "expect (the freshPages cursor arithmetic)") {
    val spark2 = spark
    import spark2.implicits._
    val path = tmpDb("mix.accdb")
    Seq[(Int, String, Seq[(String, String)])](
      (1, "a", Seq(("x", "t1"), ("y", "t2"))),
      (2, "b", Seq(("z", "t3"))))
      .toDF("pid", "nm", "tags")
      .select(col("pid"), col("nm"),
        expr("transform(tags, x -> named_struct(" +
          "'Value', x._1, 'Kind', x._2))").as("tags"))
      .write.format("jetmdb").option("table", "Parents")
      .option("version", "ace")
      .option("indexes", "PrimaryKey:pid:p;ByName:nm:u")
      .option("relationships", "SelfRef:pid>Parents.pid:0")
      .mode("overwrite").save(path)
    // table data + complex values resolve
    val back = spark.read.format("jetmdb").option("table", "Parents")
      .load(path).orderBy(col("pid")).collect()
    assert(back(0).getSeq[org.apache.spark.sql.Row](2)
      .map(_.getString(0)) == Seq("x", "y"))
    assert(back(1).getSeq[org.apache.spark.sql.Row](2)
      .map(_.getString(1)) == Seq("t3"))
    // index section survives next to the complex machinery
    import graft.sources.jetmdb.JetMdbSource
    val idx = JetMdbSource.indexes(path, "Parents")
    assert(idx.exists(i => i.primary && i.columns == Seq("pid")))
    assert(idx.exists(i => i.unique && i.columns == Seq("nm")))
    // relationships table landed under its own TDEF
    assert(JetMdbSource.relationships(path).map(_.name) ==
      Seq("SelfRef"))
    // and the hidden tables stay out of the user listing
    assert(JetMdbSource.listTables(path).map(_._1) == Seq("Parents"))
  }

  test("ACE Date/Time Extended WRITE (r13): datextColumns routes a " +
    "timestamp through the 42-byte profile, micros-exact both sides " +
    "of 1970; non-ACE targets and non-timestamp columns reject") {
    val spark2 = spark
    import spark2.implicits._
    val path = tmpDb("dx.accdb")
    // proleptic-Gregorian inputs via to_timestamp — a java.sql
    // .Timestamp detours through the HYBRID Julian calendar and
    // shifts year-1000 dates by 5 days before Spark ever sees them
    val src = Seq(
      (1, "2001-02-03 04:05:06.123456"),
      (2, "1000-01-01 00:00:00.000987")).toDF("id", "s")
      .select(col("id"), to_timestamp(col("s")).as("dt"))
    val want = src.orderBy(col("id"))
      .select(expr("unix_micros(dt)")).collect()
      .map(_.getLong(0)).toSeq
    src.write.format("jetmdb").option("table", "t")
      .option("version", "ace").option("datextColumns", "dt")
      .mode("overwrite").save(path)
    val back = spark.read.format("jetmdb").option("table", "t")
      .load(path).orderBy(col("id"))
    assert(back.schema("dt").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val micros = back.select(expr("unix_micros(dt)")).collect()
      .map(_.getLong(0)).toSeq
    assert(micros == want)
    assert(want(1) ==
      java.time.Instant.parse("1000-01-01T00:00:00Z")
        .toEpochMilli * 1000 + 987) // proleptic, micros intact
    val t1 = java.sql.Timestamp.from(
      java.time.Instant.parse("2001-02-03T04:05:06.123456Z"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e1 = intercept[Exception] {
      Seq((1, t1)).toDF("id", "dt")
        .write.format("jetmdb").option("table", "t")
        .option("datextColumns", "dt")
        .mode("overwrite").save(tmpDb("dx.mdb")) // not ACE
    }
    assert(msgs(e1).exists(_.contains("ace")), msgs(e1).mkString("|"))
    val e2 = intercept[Exception] {
      Seq((1, t1)).toDF("id", "dt")
        .write.format("jetmdb").option("table", "t")
        .option("version", "ace").option("datextColumns", "id")
        .mode("overwrite").save(tmpDb("dx2.accdb"))
    }
    assert(msgs(e2).exists(_.contains("timestamp")),
      msgs(e2).mkString("|"))
    // ON-DISK byte pin, hand-computed (not derived from any of the
    // three implementations — reader, writer, fixture — so a shared
    // profile drift cannot pass silently): 2001-02-03 04:05:06.123456
    // = day 730518 since 0001-01-01 (epochDay 11356 + 719162),
    // second 14706 of the day, 1234560 hundred-ns units.
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val pin = "000730518:14706:1234560"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val found = (0 until bytes.length - pin.length).exists { off =>
      pin.indices.forall(k => bytes(off + k) == pin(k))
    }
    assert(found, "42-byte DATEXT field does not carry the " +
      "hand-computed 9:5:7 ASCII digits")
  }

  test("ACE complex column without an MSysComplexColumns row still " +
    "rejects loudly; header magic and version must agree") {
    val path = tmpDb("noreg.accdb")
    JetMdbFixture.write(path, Seq(Table("t",
      Seq(Col("id", 0x04), Col("x", 0x12)),
      Seq())), aceVersion = 0x02)
    val e = intercept[Exception] {
      spark.read.format("jetmdb").option("table", "t").load(path)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("MSysComplexColumns")),
      msgs(e).mkString(" | "))
    // corrupt/adversarial headers: magic and version must agree
    val good = tmpDb("good.accdb")
    JetMdbFixture.write(good,
      Seq(Table("t", Seq(Col("id", 0x04)), Seq())), aceVersion = 0x02)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(good))
    val jetMagicAceVer = bytes.clone()
    System.arraycopy("Standard Jet DB".getBytes("US-ASCII"), 0,
      jetMagicAceVer, 4, 15)
    intercept[IllegalArgumentException] {
      JetMdbFormat.checkHeader(jetMagicAceVer)
    }
    val aceMagicJetVer = bytes.clone()
    aceMagicJetVer(0x14) = 0x01
    intercept[IllegalArgumentException] {
      JetMdbFormat.checkHeader(aceMagicJetVer)
    }
  }

  test("ACE WRITE path (r12): version=ace emits an .accdb header " +
    "over the Jet4 layout, Large Number round-trips, appends are " +
    "version-checked both ways") {
    val spark2 = spark
    import spark2.implicits._
    val path = tmpDb("w.accdb")
    Seq((1, 9007199254740993L, "a"), (2, -7L, "b"))
      .toDF("id", "big", "v")
      .write.format("jetmdb").option("table", "T")
      .option("version", "ace").mode("overwrite").save(path)
    // header bytes: ACE magic + version 0x02
    val head = Files.readAllBytes(java.nio.file.Paths.get(path))
      .take(32)
    assert(new String(head.slice(4, 19), "US-ASCII") ==
      "Standard ACE DB")
    assert(head(0x14) == 0x02)
    val back = spark.read.format("jetmdb").option("table", "T")
      .load(path).orderBy(col("id")).collect()
    assert(back.map(_.getLong(1)).toSeq ==
      Seq(9007199254740993L, -7L))
    assert(back.map(_.getString(2)).toSeq == Seq("a", "b"))
    // append a second table — must carry the ace option
    Seq((10L, "x")).toDF("k", "w")
      .write.format("jetmdb").option("table", "U")
      .option("version", "ace").mode("append").save(path)
    assert(spark.read.format("jetmdb").option("table", "U")
      .load(path).collect()(0).getLong(0) == 10L)
    // version mismatch on append rejects, both directions
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e1 = intercept[Exception] {
      Seq((1, "y")).toDF("k", "w")
        .write.format("jetmdb").option("table", "V")
        .mode("append").save(path) // jet4 append into .accdb
    }
    assert(msgs(e1).exists(_.contains("ACE")), msgs(e1).mkString("|"))
    val p4 = tmpDb("plain.mdb")
    Seq((1, "y")).toDF("k", "w")
      .write.format("jetmdb").option("table", "V")
      .mode("overwrite").save(p4)
    val e2 = intercept[Exception] {
      Seq((2, "z")).toDF("k", "w")
        .write.format("jetmdb").option("table", "W")
        .option("version", "ace").mode("append").save(p4)
    }
    assert(msgs(e2).exists(_.contains("Jet4")), msgs(e2).mkString("|"))
    // BIGINT without the ace option still rejects loudly, naming it
    val e3 = intercept[Exception] {
      Seq((1L, "y")).toDF("k", "w")
        .write.format("jetmdb").option("table", "X")
        .mode("overwrite").save(tmpDb("rej.mdb"))
    }
    assert(msgs(e3).exists(_.contains("ace")), msgs(e3).mkString("|"))
  }

  test("version sniffing serves accdb, Jet4, and Jet3 files side by " +
    "side through the same reader code path") {
    spark.sparkContext
    val dir = Files.createTempDirectory("accmix").toString
    val pA = s"$dir/a.accdb"
    val p4 = s"$dir/b.mdb"
    val p3 = s"$dir/c97.mdb"
    JetMdbFixture.write(pA, Seq(Table(
      "t", Seq(Col("n", 0x13)),
      Seq(Seq(java.lang.Long.valueOf(40L))))), aceVersion = 0x03)
    JetMdbFixture.write(p4, Seq(Table(
      "t", Seq(Col("n", 0x04)), Seq(Seq(Integer.valueOf(41))))))
    Jet3Fixture.write(p3, Seq(Jet3Fixture.Table(
      "t", Seq(Jet3Fixture.Col("n", 0x04)),
      Seq(Seq(Integer.valueOf(42))))))
    def one(p: String): Long =
      spark.read.format("jetmdb").option("table", "t").load(p)
        .select(col("n").cast("long")).collect()(0).getLong(0)
    assert(one(pA) == 40L && one(p4) == 41L && one(p3) == 42L)
  }
}
