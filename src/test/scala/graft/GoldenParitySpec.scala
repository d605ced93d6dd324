package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** In-repo mirror of the driver's DuckDB oracle gate (SURVEY.md §5.2).
  *
  * For every declared query with an oracle, compares the Spark result on
  * sf0.001 against a committed golden CSV generated from DuckDB running
  * the same oracle SQL (dev/make_golden.py). The golden is parsed with
  * the query result's own schema, so values compare as typed rows, and
  * row ORDER matters — the §0 determinism contract is asserted
  * mechanically.
  */
class GoldenParitySpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = TestSpark.session

  for (q <- SparkEntry.registry if q.oracle.isDefined) {
    test(s"${q.name} matches DuckDB golden") {
      val url = getClass.getResource(s"/golden/${q.name}.csv")
      assert(url != null, s"missing golden for ${q.name} — run dev/make_golden.py")
      val result = q.fn(spark, sfDir)
      val golden = spark.read
        .schema(result.schema)
        .option("header", "true")
        // DuckDB COPY writes RFC4180 CSV (embedded quotes doubled);
        // Spark's default escape is backslash — align to RFC4180
        .option("escape", "\"")
        // DuckDB encodes '' as a QUOTED empty field and NULL as a bare
        // empty field. Spark folds both to null: the parser yields ""
        // for the quoted form, and the default nullValue="" then nulls
        // it. emptyValue keeps the quoted form as "", and a sentinel
        // nullValue (never emitted by DuckDB COPY) stops the fold —
        // bare-empty fields still parse to null natively
        // (q_dedup_span_cut's fully-cut doc has a genuinely empty
        // clean_text that must NOT equal null)
        .option("emptyValue", "")
        .option("nullValue", "__null__")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .csv(url.getPath)
      val got = result.collect().toSeq
      val want = golden.collect().toSeq
      assert(got.length == want.length,
        s"row count: spark=${got.length} golden=${want.length}")
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"row $i differs:\n  spark : $g\n  golden: $w")
      }
    }
  }
}
