package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.jetmdb.JetMdbFormat

/** Ready-to-fire validation hooks for REAL external fixtures the
  * offline container cannot ship (SURVEY §7 risks 7/8): the moment a
  * genuine Microsoft Access file or a live PostgreSQL is available,
  * pointing an env var at it turns these from clean cancellations into
  * real proof — no code changes needed on that day.
  *
  *   - `GRAFT_REAL_MDB=/path/to/file.mdb` — validates the jetmdb
  *     binary reader against a file produced by ACTUAL Access/Jet
  *     (the in-repo fixtures round-trip our own writer, which cannot
  *     rule out a complementary-bug pair; JetMdbFormat.scala documents
  *     the NUMERIC-profile ambiguity this resolves).
  *   - `GRAFT_PG_URL=jdbc:postgresql://...` — live-PostgreSQL JDBC
  *     round-trip (JdbcConnectorSpec also honors it; Derby covers the
  *     code paths offline).
  */
class RealFixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("jetmdb decodes a REAL Access .mdb (env-gated: GRAFT_REAL_MDB)") {
    val path = sys.env.get("GRAFT_REAL_MDB")
    assume(path.isDefined,
      "GRAFT_REAL_MDB not set — no real Access fixture in this " +
        "environment; set it to a Jet4 .mdb to run this validation")
    val file = new java.io.File(path.get)
    assert(file.isFile, s"GRAFT_REAL_MDB=$path is not a file")
    // raw page-walk: header + catalog come from the format layer
    // directly, independent of the DSv2 plumbing
    val raf = new java.io.RandomAccessFile(file, "r")
    def page(n: Int): Array[Byte] = {
      val p = new Array[Byte](JetMdbFormat.PageSize)
      raf.seek(n.toLong * JetMdbFormat.PageSize)
      raf.readFully(p)
      p
    }
    try {
      val pageCount = (file.length() / JetMdbFormat.PageSize).toInt
      JetMdbFormat.checkHeader(page(0))
      val userTables = JetMdbFormat
        .readCatalog(pageCount, page)
        .filterNot(_.isSystem)
      assert(userTables.nonEmpty,
        s"real .mdb has no user tables in MSysObjects")
      // every user table: the DSv2 read must produce a non-degenerate
      // schema and a row count equal to an INDEPENDENT raw page walk
      // over that table's data pages — decoder vs reader cross-check
      userTables.foreach { t =>
        val df = spark.read.format("jetmdb")
          .option("table", t.name).load(path.get)
        assert(df.schema.nonEmpty, s"table ${t.name}: empty schema")
        val viaDsv2 = df.count()
        val tdef = JetMdbFormat.parseTdef(page(t.tdefPage), t.tdefPage)
        val raw = (1 until pageCount).map { pn =>
          JetMdbFormat.dataRowExtents(page(pn), t.tdefPage).size.toLong
        }.sum
        assert(viaDsv2 == raw,
          s"table ${t.name}: DSv2 read $viaDsv2 rows, raw page walk " +
            s"found $raw (tdef=${tdef.columns.map(_.name)})")
        // decode every row fully (exercises MEMO/long-value paths)
        assert(df.collect().length == viaDsv2)
      }
    } finally raf.close()
  }

  test("jdbc round-trip against live PostgreSQL (env-gated: GRAFT_PG_URL)") {
    val url = sys.env.get("GRAFT_PG_URL")
    assume(url.isDefined,
      "GRAFT_PG_URL not set — no live PostgreSQL in this environment; " +
        "set it to a jdbc:postgresql:// URL to run this validation")
    val src = graft.sources.TableLoader
      .nation(spark, "/root/testdata/sf0.001")
    graft.sources.JdbcConnector.write(
      src, url.get, "graft_nation_rt",
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    val back = graft.sources.JdbcConnector.read(
      spark, url.get, "graft_nation_rt",
      Some(graft.sources.JdbcConnector.PartitionSpec(
        "n_nationkey", 0, 25, 4)))
    assert(back.count() == src.count())
    val a = src.orderBy("n_nationkey").collect().toSeq
    val b = back.select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").collect().toSeq
    assert(a == b)
  }
}
