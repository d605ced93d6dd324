package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MigrationPipeline
import graft.etl.MigrationPipeline.{JdbcSink, TableSpec}
import graft.sources.JetTypes.{LongInteger, ShortText}
import graft.sources.jetmdb.JetMdbFormat.JetIndex
import graft.sources.jetmdb.JetMdbSource
import graft.sources.jetmdb.JetMdbSource.JetRelationshipRow

/** The post-load constraints stage end to end: index metadata in the
  * Jet TDEF (read from fixtures written by the INDEPENDENT test-side
  * writer AND round-tripped through the production writer),
  * MSysRelationships as the referential-integrity catalog, DDL
  * rendering for both dialects, and the constraints actually applied
  * and ENFORCED by an embedded Derby after a real migrate(). */
class JetMdbConstraintsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("fixture-written TDEF index section parses: PK, unique, plain") {
    spark.sparkContext // JetMdbSource.fs needs an active session
    val dir = tmp("graft_jetidx")
    val path = s"$dir/idx.mdb"
    JetMdbFixture.write(path, Seq(
      JetMdbFixture.Table(
        "Widgets",
        Seq(
          JetMdbFixture.Col("Widget ID", 0x04),
          JetMdbFixture.Col("Batch", 0x04),
          JetMdbFixture.Col("Serial", 0x0A),
          JetMdbFixture.Col("Label", 0x0A)),
        Seq(Seq(Integer.valueOf(1), Integer.valueOf(7), "s1", "a")),
        indexes = Seq(
          JetMdbFixture.IndexDef("PrimaryKey",
            Seq("Widget ID", "Batch"), unique = true, primary = true),
          JetMdbFixture.IndexDef("BySerial",
            Seq("Serial"), unique = true, primary = false),
          JetMdbFixture.IndexDef("ByLabel",
            Seq("Label"), unique = false, primary = false)))))
    val idxs = JetMdbSource.indexes(path, "Widgets")
    assert(idxs == Seq(
      JetIndex("PrimaryKey", Seq("Widget ID", "Batch"),
        unique = true, primary = true),
      JetIndex("BySerial", Seq("Serial"), unique = true, primary = false),
      JetIndex("ByLabel", Seq("Label"), unique = false, primary = false)))
    // the index section must not disturb the data read
    val rows = spark.read.format("jetmdb")
      .option("table", "Widgets").load(path).collect()
    assert(rows.length == 1 && rows(0).getInt(0) == 1)
  }

  test("fixture MSysRelationships reads as ordered relationship rows " +
    "and stays out of listTables") {
    spark.sparkContext // JetMdbSource.fs needs an active session
    val dir = tmp("graft_jetrel")
    val path = s"$dir/rel.mdb"
    val relCols = Seq(
      JetMdbFixture.Col("ccolumn", 0x04),
      JetMdbFixture.Col("grbit", 0x04),
      JetMdbFixture.Col("icolumn", 0x04),
      JetMdbFixture.Col("szColumn", 0x0A),
      JetMdbFixture.Col("szObject", 0x0A),
      JetMdbFixture.Col("szReferencedColumn", 0x0A),
      JetMdbFixture.Col("szReferencedObject", 0x0A),
      JetMdbFixture.Col("szRelationship", 0x0A))
    def rel(cc: Int, gr: Int, ic: Int, c: String, o: String, rc: String,
        ro: String, n: String): Seq[Any] =
      Seq(Integer.valueOf(cc), Integer.valueOf(gr), Integer.valueOf(ic),
        c, o, rc, ro, n)
    JetMdbFixture.write(path, Seq(
      JetMdbFixture.Table(
        "Orders",
        Seq(JetMdbFixture.Col("Order ID", 0x04)),
        Seq(Seq(Integer.valueOf(1)))),
      JetMdbFixture.Table(
        "MSysRelationships", relCols,
        Seq( // two-column FK declared out of icolumn order + a 1-col FK
          rel(2, 0x1000, 1, "Part No", "Order Lines", "Part No",
            "Parts", "LinesParts"),
          rel(2, 0x1000, 0, "Order ID", "Order Lines", "Order ID",
            "Parts", "LinesParts"),
          rel(1, 0x2, 0, "Customer ID", "Orders", "Customer ID",
            "Customers", "OrdersCustomers")),
        system = true)))
    assert(JetMdbSource.listTables(path).map(_._1) == Seq("Orders"),
      "MSysRelationships must not list as a user table")
    val rels = JetMdbSource.relationships(path)
    assert(rels.map(_.name) ==
      Seq("LinesParts", "LinesParts", "OrdersCustomers"))
    assert(rels.take(2).map(r => (r.icolumn, r.column)) ==
      Seq((0, "Order ID"), (1, "Part No")),
      "rows must come back icolumn-ordered within a relationship")
    assert(rels(0).deleteCascade && !rels(0).updateCascade)
    assert(rels(0).enforced && !rels(2).enforced)
    assert(JetMdbSource.relationships(
      path) == rels, "re-read must be stable")
  }

  test("production writer round-trips indexes and relationships " +
    "through its own options") {
    val dir = tmp("graft_jetwidx")
    val path = s"$dir/out.mdb"
    Seq((1, 10, "a"), (2, 20, "b"))
      .toDF("pid", "ref", "name")
      .write.format("jetmdb")
      .option("table", "Items")
      .option("indexes", "PrimaryKey:pid:p;ByRef:ref:;ByName:name:u")
      .option("relationships", "ItemsParents:ref>Parents.pid:4096")
      .mode("overwrite").save(path)
    val idxs = JetMdbSource.indexes(path, "Items")
    assert(idxs == Seq(
      JetIndex("PrimaryKey", Seq("pid"), unique = true, primary = true),
      JetIndex("ByRef", Seq("ref"), unique = false, primary = false),
      JetIndex("ByName", Seq("name"), unique = true, primary = false)))
    val rels = JetMdbSource.relationships(path)
    assert(rels == Seq(JetRelationshipRow(
      "ItemsParents", "Items", "ref", "Parents", "pid", 0, 1, 4096)))
    // data pages coexist with the relationship system table
    val back = spark.read.format("jetmdb")
      .option("table", "Items").load(path)
      .orderBy("pid").collect()
    assert(back.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(JetMdbSource.listTables(path).map(_._1) == Seq("Items"))
  }

  test("constraintDdl: derby dialect adds NOT NULL before the PK and " +
    "suppresses ON UPDATE CASCADE") {
    val specs = Seq(TableSpec("T One", null, Nil,
      Seq(JetIndex("PrimaryKey", Seq("A Id"), unique = true,
        primary = true))))
    val rels = Seq(
      JetRelationshipRow("R1", "T One", "B Ref", "T Two", "B Id",
        0, 1, 0x100 | 0x1000))
    val pg = MigrationPipeline.constraintDdl(specs, rels)
    assert(pg == Seq(
      "ALTER TABLE t_one ADD CONSTRAINT t_one_pkey PRIMARY KEY (\"a_id\")",
      "ALTER TABLE t_one ADD CONSTRAINT fk_r1 FOREIGN KEY (\"b_ref\") " +
        "REFERENCES t_two (\"b_id\") ON DELETE CASCADE ON UPDATE CASCADE"))
    val derby = MigrationPipeline.constraintDdl(specs, rels, "derby")
    assert(derby == Seq(
      "ALTER TABLE t_one ALTER COLUMN \"a_id\" NOT NULL",
      "ALTER TABLE t_one ADD CONSTRAINT t_one_pkey PRIMARY KEY (\"a_id\")",
      "ALTER TABLE t_one ADD CONSTRAINT fk_r1 FOREIGN KEY (\"b_ref\") " +
        "REFERENCES t_two (\"b_id\") ON DELETE CASCADE"))
  }

  test("migrate applies ENFORCED constraints after load (Derby E2E): " +
    "PK uniqueness, FK integrity, delete cascade") {
    val dbDir = Files.createTempDirectory("graft_derby_cons").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val specs = Seq(
      TableSpec(
        "Parent T",
        _ => Seq(("1", "ann"), ("2", "bo")).toDF("Pid", "Name"),
        Seq("Pid" -> LongInteger, "Name" -> ShortText),
        Seq(JetIndex("PrimaryKey", Seq("Pid"), unique = true,
          primary = true))),
      TableSpec(
        "Child T",
        _ => Seq(("10", "1"), ("11", "2")).toDF("Cid", "Pref"),
        Seq("Cid" -> LongInteger, "Pref" -> LongInteger),
        Seq(JetIndex("PrimaryKey", Seq("Cid"), unique = true,
          primary = true))))
    val rels = Seq(JetRelationshipRow(
      "ParentChild", "Child T", "Pref", "Parent T", "Pid", 0, 1, 0x1000))
    val counts = MigrationPipeline.migrate(
      spark, specs, JdbcSink(url), props, rels)
    assert(counts == Map("Parent T" -> 2L, "Child T" -> 2L))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        // PK enforced: duplicate key must fail
        val dup = intercept[java.sql.SQLException] {
          st.execute("INSERT INTO parent_t VALUES (1, 'dup')")
        }
        assert(dup.getSQLState.startsWith("23"), dup.getMessage)
        // FK enforced: an orphan child must fail
        val orphan = intercept[java.sql.SQLException] {
          st.execute("INSERT INTO child_t VALUES (12, 99)")
        }
        assert(orphan.getSQLState.startsWith("23"), orphan.getMessage)
        // delete cascade: removing parent 1 removes child 10
        st.execute("DELETE FROM parent_t WHERE \"pid\" = 1")
        val rs = st.executeQuery("SELECT COUNT(*) FROM child_t")
        rs.next()
        assert(rs.getInt(1) == 1, "cascade must delete child 10")
      } finally st.close()
    } finally conn.close()
  }

  test("q_migration_constraints renders the stable statement list") {
    val rows = SparkEntry.queries("q_migration_constraints")(
      spark, "unused").collect()
    assert(rows.length == 10, rows.mkString("\n"))
    val kinds = rows.map(_.getString(1)).toSeq
    assert(kinds.count(_ == "primary_key") == 3)
    assert(kinds.count(_ == "index") == 2)
    assert(kinds.count(_ == "foreign_key") == 2)
    // AutoNumber: the retrofitted identity + its sequence alignment
    assert(kinds.count(_ == "identity") == 2)
    // the un-enforced relationship documents itself instead of
    // constraining
    assert(kinds.count(_ == "comment") == 1)
    val ddl = rows.map(_.getString(2)).mkString("\n")
    assert(ddl.contains("ON DELETE CASCADE"))
    assert(ddl.contains("ON UPDATE CASCADE"))
    assert(ddl.contains("dbRelationDontEnforce"))
    assert(ddl.contains("GENERATED BY DEFAULT AS IDENTITY"))
    assert(ddl.contains("setval(pg_get_serial_sequence"))
  }

  test("AutoNumber: flag round-trips through the jetmdb writer, " +
    "ddl() renders IDENTITY, Derby assigns on insert") {
    val dir = tmp("graft_autonum")
    val path = s"$dir/auto.mdb"
    Seq((1, "a"), (2, "b")).toDF("id", "label")
      .write.format("jetmdb")
      .option("table", "Widgets")
      .option("indexes", "PrimaryKey:id:p")
      .option("autonumber", "id")
      .mode("overwrite").save(path)
    val specs = MigrationPipeline.specsFromJetMdb(path)
    assert(specs.length == 1)
    assert(specs.head.autoNumberCols == Seq("id"))
    assert(specs.head.indexes.exists(_.primary))
    assert(specs.head.typed)
    // rendering: the CREATE carries BY DEFAULT identity (loaded keys
    // must stand), SQL:2003 syntax Derby also accepts
    val create = MigrationPipeline.ddl(specs.head)
    assert(create.contains(
      "id INTEGER GENERATED BY DEFAULT AS IDENTITY"), create)
    // Derby proves the semantic: loaded keys stand, the next insert
    // without a key gets a generated one
    val dbDir = java.nio.file.Files
      .createTempDirectory("graft_derby_id").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        st.execute(create.stripSuffix(";").replace("widgets", "widgets_t"))
        st.execute("INSERT INTO widgets_t VALUES (7, 'seven')")
        st.execute("INSERT INTO widgets_t (label) VALUES ('auto')")
        val rs = st.executeQuery(
          "SELECT COUNT(*), MAX(id) FROM widgets_t")
        rs.next()
        assert(rs.getInt(1) == 2)
        assert(rs.getInt(2) >= 7 || rs.getInt(2) >= 1)
      } finally st.close()
    } finally conn.close()
  }

  test("append mode builds a MULTI-TABLE .mdb: second and third " +
    "tables, relationships folding into MSysRelationships, one-call " +
    "migration with a REAL cross-table FK") {
    val dir = tmp("graft_multi")
    val path = s"$dir/multi.mdb"
    Seq((1, "ann"), (2, "bo"), (3, "cy"))
      .toDF("pid", "name")
      .write.format("jetmdb")
      .option("table", "Parents")
      .option("indexes", "PrimaryKey:pid:p")
      .mode("overwrite").save(path)
    Seq((10, 1, "x"), (11, 2, "y"), (12, 2, "z"))
      .toDF("cid", "pref", "tag")
      .write.format("jetmdb")
      .option("table", "Children")
      .option("indexes", "PrimaryKey:cid:p;ByRef:pref:")
      .option("relationships", "ParentsChildren:pref>Parents.pid:4096")
      .mode("append").save(path)
    // third table: relationships FOLD INTO the existing catalog
    Seq((100, 1)).toDF("nid", "owner")
      .write.format("jetmdb")
      .option("table", "Notes")
      .option("relationships", "ParentsNotes:owner>Parents.pid:0")
      .mode("append").save(path)
    assert(JetMdbSource.listTables(path).map(_._1).sorted ==
      Seq("Children", "Notes", "Parents"))
    // every table reads back intact, indexes preserved across appends
    def rows(t: String) = spark.read.format("jetmdb")
      .option("table", t).load(path).collect()
    assert(rows("Parents").length == 3)
    assert(rows("Children").length == 3)
    assert(rows("Notes").length == 1)
    assert(JetMdbSource.indexes(path, "Parents")
      .exists(_.primary), "parent PK must survive appends")
    assert(JetMdbSource.indexes(path, "Children").map(_.name).toSet ==
      Set("PrimaryKey", "ByRef"))
    val rels = JetMdbSource.relationships(path)
    assert(rels.map(_.name).sorted ==
      Seq("ParentsChildren", "ParentsNotes"))
    // appending a same-named table is rejected, never a replace
    val dup = intercept[Exception] {
      Seq((9, "q")).toDF("pid", "name")
        .write.format("jetmdb").option("table", "parents")
        .mode("append").save(path)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(dup).exists(_.contains("already exists")),
      msgs(dup).mkString(" | "))
    // the whole program over the multi-table file: both tables land,
    // the REAL cross-table FK enforces and cascades
    val dbDir = java.nio.file.Files
      .createTempDirectory("graft_derby_multi").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val counts = MigrationPipeline.migrateJetMdb(
      spark, path, MigrationPipeline.JdbcSink(url), props)
    assert(counts == Map(
      "Parents" -> 3L, "Children" -> 3L, "Notes" -> 1L))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val orphan = intercept[java.sql.SQLException] {
          st.execute("INSERT INTO children VALUES (13, 99, 'w')")
        }
        assert(orphan.getSQLState.startsWith("23"), orphan.getMessage)
        st.execute("DELETE FROM parents WHERE \"pid\" = 2")
        val rs = st.executeQuery("SELECT COUNT(*) FROM children")
        rs.next()
        assert(rs.getInt(1) == 1, "cascade must delete children of 2")
      } finally st.close()
    } finally conn.close()
  }

  test("exportToJetMdb closes the FULL database round trip: " +
    "engine -> .mdb -> engine -> .mdb -> engine, constraints intact") {
    val dir = tmp("graft_dbrt")
    val p1 = s"$dir/gen1.mdb"
    val p2 = s"$dir/gen2.mdb"
    val parents = Seq((1, "ann"), (2, "bo")).toDF("pid", "name")
    val children = Seq((10, 1), (11, 2)).toDF("cid", "pref")
    val idx = Map(
      "Parents" -> "PrimaryKey:pid:p",
      "Children" -> "PrimaryKey:cid:p")
    val rel = Map(
      "Children" -> "ParentsChildren:pref>Parents.pid:4096")
    MigrationPipeline.exportToJetMdb(
      Seq("Parents" -> parents, "Children" -> children), p1, idx, rel)
    // generation 2: re-read gen1 through the binary source and export
    // it again — any lossy seam in either direction doubles up here
    def tablesOf(p: String) = JetMdbSource.listTables(p).map(_._1)
      .sorted.map(n => n -> spark.read.format("jetmdb")
        .option("table", n).load(p))
    MigrationPipeline.exportToJetMdb(tablesOf(p1), p2,
      Map("Children" -> "PrimaryKey:cid:p", "Parents" -> "PrimaryKey:pid:p"),
      rel)
    // data identical across generations
    def dump(p: String, t: String) = spark.read.format("jetmdb")
      .option("table", t).load(p)
      .orderBy(t.toLowerCase.take(1) + "id")
      .collect().toSeq
    assert(dump(p2, "Parents") == dump(p1, "Parents"))
    assert(dump(p2, "Children") == dump(p1, "Children"))
    // constraint catalog identical: PKs on both tables, the FK row
    assert(JetMdbSource.indexes(p2, "Parents").exists(_.primary))
    assert(JetMdbSource.indexes(p2, "Children").exists(_.primary))
    val r1 = JetMdbSource.relationships(p1)
    val r2 = JetMdbSource.relationships(p2)
    assert(r1.nonEmpty && r1 == r2,
      s"relationships drifted across the round trip: $r1 vs $r2")
  }

  test("migrateJetMdb: the whole program in one call — .mdb catalog " +
    "to constrained Derby target") {
    val dir = tmp("graft_onecall")
    val path = s"$dir/crm.mdb"
    Seq((10, "alpha"), (11, "beta"), (12, "gamma"))
      .toDF("pid", "title")
      .write.format("jetmdb")
      .option("table", "Projects")
      .option("indexes", "PrimaryKey:pid:p")
      .mode("overwrite").save(path)
    val dbDir = java.nio.file.Files
      .createTempDirectory("graft_derby_onecall").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val counts = MigrationPipeline.migrateJetMdb(
      spark, path, MigrationPipeline.JdbcSink(url), props)
    assert(counts == Map("Projects" -> 3L))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        // the typed path preserved exact values
        val rs = st.executeQuery(
          "SELECT \"title\" FROM projects WHERE \"pid\" = 11")
        rs.next()
        assert(rs.getString(1) == "beta")
        // the TDEF's PK arrived and is enforced
        val dup = intercept[java.sql.SQLException] {
          st.execute("INSERT INTO projects VALUES (10, 'dup')")
        }
        assert(dup.getSQLState.startsWith("23"), dup.getMessage)
      } finally st.close()
    } finally conn.close()
  }
}
