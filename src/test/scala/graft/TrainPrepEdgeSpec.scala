package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics for the r12 pretraining transforms (q_span_corrupt,
  * q_fim_split) on inputs the driver fixture never contains —
  * multi-space runs (empty tokens), single-token documents, non-ASCII
  * BMP text — each checked against an INDEPENDENT plain-Scala
  * re-implementation of the documented semantics (java MessageDigest
  * md5, String char arithmetic), not against the query's own SQL. */
class TrainPrepEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def mkDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_prep_edge").toString
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_span_corrupt matches an independent reference on " +
    "multi-space, single-token, and non-ASCII documents") {
    // doc_ids are multiples of 5 (the query's sample filter)
    val docs = Seq(
      5L -> "alpha  beta gamma delta epsilon zeta eta theta",
      10L -> "solo",
      15L -> "héllo wörld é ü naïve façade coöp",
      20L -> ((0 until 40).map(i => s"tok$i").mkString(" ")))
    val dir = mkDocs(docs)
    val got = SparkEntry.queries("q_span_corrupt")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"),
          r.getAs[Long]("n_spans"), r.getAs[String]("input_text"),
          r.getAs[String]("target_text")))
      .toMap
    docs.foreach { case (id, text) =>
      // independent reference: split preserves empty tokens like
      // Spark split / DuckDB string_split
      val toks = text.split(" ", -1)
      val msk = toks.indices.map(i =>
        "01".contains(md5hex(s"$id-$i").charAt(0)))
      var runId = 0
      val in = new StringBuilder
      val tg = new StringBuilder
      var prev = false
      toks.indices.foreach { i =>
        if (!msk(i)) {
          if (in.nonEmpty) in.append(' ')
          in.append(toks(i))
        } else {
          if (!prev) {
            if (in.nonEmpty) in.append(' ')
            in.append(s"<extra_id_$runId>")
            if (tg.nonEmpty) tg.append(' ')
            tg.append(s"<extra_id_$runId> ").append(toks(i))
            runId += 1
          } else {
            tg.append(' ').append(toks(i))
          }
        }
        prev = msk(i)
      }
      val want = (toks.length.toLong, msk.count(identity).toLong,
        runId.toLong, in.toString, tg.toString)
      assert(got(id) == want, s"doc $id: got ${got(id)} want $want")
    }
    // sanity: the sample filter excluded the non-multiple ids
    assert(got.keySet == docs.map(_._1).toSet)
  }

  test("q_fim_split matches an independent reference incl. cut " +
    "degeneracies (lo=0, hi=n, lo=hi) and non-ASCII chars") {
    // doc_ids multiples of 3 (the query's sample filter)
    val docs = Seq(
      3L -> "short",
      6L -> "the quick brown fox jumps over the lazy dog",
      9L -> "héllo wörld — naïve façade",
      12L -> "x")
    val dir = mkDocs(docs)
    val got = SparkEntry.queries("q_fim_split")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("cut_a"), r.getAs[Int]("cut_b"),
          r.getAs[Int]("n_chars"), r.getAs[String]("fim_text")))
      .toMap
    docs.foreach { case (id, text) =>
      val n = text.length // char count: all-BMP test data
      def draw(tag: String): Long =
        java.lang.Long.parseLong(
          md5hex(s"$id-$tag").substring(0, 6), 16) % (n + 1)
      val (u1, u2) = (draw("a"), draw("b"))
      val lo = math.min(u1, u2).toInt
      val hi = math.max(u1, u2).toInt
      val want = (lo, hi, n,
        "<PRE>" + text.substring(0, lo) +
          "<SUF>" + text.substring(hi) +
          "<MID>" + text.substring(lo, hi))
      assert(got(id) == want, s"doc $id: got ${got(id)} want $want")
    }
    assert(got.keySet == docs.map(_._1).toSet)
  }
}
