package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcConnector
import graft.sources.TableLoader

/** JDBC integration is env-gated: no database is reachable in the
  * offline harness (SURVEY.md §7 risk 8), so the round-trip only runs
  * when SPARK_GRAFT_JDBC_URL points at a live server. The option
  * plumbing itself is covered by the cancellation path still
  * constructing the reader plan. */
class JdbcConnectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("jdbc round-trip against embedded Derby") {
    // Derby ships with the Spark distribution — a real in-process
    // database exercises the exact jdbc_source/jdbc_sink code paths
    // (dialect mapping, batched insert, partitioned read) offline
    // unique per-run path: embedded Derby allows one JVM per database,
    // a fixed path would collide across concurrent checkouts
    val dbDir = java.nio.file.Files
      .createTempDirectory("graft_derby_rt").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val src = TableLoader.nation(spark, "/root/testdata/sf0.001")
    JdbcConnector.write(
      src, url, "graft_nation_rt",
      mode = org.apache.spark.sql.SaveMode.Overwrite, props = props)
    val back = JdbcConnector.read(
      spark, url, "graft_nation_rt",
      Some(JdbcConnector.PartitionSpec("n_nationkey", 0, 25, 4)),
      props = props)
    assert(back.count() == src.count())
    val a = src.orderBy("n_nationkey").collect().toSeq
    val b = back
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").collect().toSeq
    assert(a == b)
  }

  test("connect forwards user/password props to the driver") {
    // Embedded Derby without authentication still USES the `user`
    // prop: it becomes the connection's default schema. A connection
    // whose CURRENT SCHEMA matches the passed user proves the props
    // map reached DriverManager (the r9 ADVICE gap: getConnection(url)
    // alone silently dropped credentials runActionQueries was passed).
    val dbDir = java.nio.file.Files
      .createTempDirectory("graft_derby_auth").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = graft.sources.JdbcConnector.connect(
      url, Map(
        "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
        "user" -> "GRAFTUSER", "password" -> "pw"))
    try {
      val rs = conn.createStatement()
        .executeQuery("VALUES CURRENT SCHEMA")
      assert(rs.next() && rs.getString(1) == "GRAFTUSER")
    } finally conn.close()
  }

  test("jdbc round-trip (integration, env-gated)") {
    // GRAFT_PG_URL is the documented live-PostgreSQL hook
    // (RealFixtureSpec); SPARK_GRAFT_JDBC_URL accepted for any server
    val url = sys.env.get("GRAFT_PG_URL")
      .orElse(sys.env.get("SPARK_GRAFT_JDBC_URL"))
    assume(url.isDefined,
      "GRAFT_PG_URL / SPARK_GRAFT_JDBC_URL not set — skipping")
    val src = TableLoader.nation(spark, "/root/testdata/sf0.001")
    JdbcConnector.write(src, url.get, "graft_nation_rt")
    val back = JdbcConnector.read(
      spark, url.get, "graft_nation_rt",
      Some(JdbcConnector.PartitionSpec("n_nationkey", 0, 25, 4)))
    assert(back.count() == src.count())
  }
}
