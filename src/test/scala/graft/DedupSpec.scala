package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-duplicate tests for the dedup family (SURVEY.md §5.3): the
  * fixtures contain near-dups only at sf0.1, so these specs write their
  * own documents.parquet with known exact/near/independent docs into a
  * temp sfDir and run the declared queries against it.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private val vocab = Seq(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  private def randomDoc(n: Int): String =
    Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")

  /** doc 0/1: exact dups; doc 2: near-dup of 0 (one token edited);
    * docs 3..22: independent random docs. */
  private lazy val sfDir: String = {
    val dir = Files.createTempDirectory("graft_dedup").toString
    val base = randomDoc(60)
    val nearDup = {
      val t = base.split(" ")
      t.update(30, "zulu") // single-token edit
      t.mkString(" ")
    }
    val docs = Seq(
      (0L, base, "en", "src0"),
      (1L, base, "en", "src0"),
      (2L, nearDup, "en", "src0")) ++
      (3L to 22L).map(i => (i, randomDoc(60), "en", "src0"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_dedup_exact labels the seeded exact-dup group per document") {
    val out = SparkEntry.queries("q_dedup_exact")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_size"), r.getAs[Boolean]("is_kept")))
      .toMap
    // r12 shape: one verdict row per document (23 seeded docs)
    assert(out.size == 23)
    // the seeded byte-identical pair: min-id keeper wins
    assert(out(0L) == ((2L, true)) && out(1L) == ((2L, false)))
    // the near-dup (2) and the independents are singleton keepers
    assert(out(2L) == ((1L, true)))
    assert((3L to 22L).forall(i => out(i) == ((1L, true))))
  }

  test("q_dedup_minhash: near-dup pair is a candidate, independents are not") {
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    // exact pair (0,1) and near pair (0,2)/(1,2) must surface
    assert(pairs.contains((0L, 1L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      s"near-dup pair missing from $pairs")
    // independent random docs must (overwhelmingly) not pair up
    val falsePairs = pairs.filter { case (a, b) => a >= 3 && b >= 3 }
    assert(falsePairs.size <= 2, s"too many false candidates: $falsePairs")
  }

  test("q_dedup_minhash jaccard values are exact") {
    val out = SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        -> r.getAs[Double]("jaccard")).toMap
    assert(out((0L, 1L)) == 1.0) // identical docs
    assert(out((0L, 2L)) > 0.8 && out((0L, 2L)) < 1.0) // one-token edit
  }

  test("q_dedup_simhash: near-dups within hamming 8, independents far") {
    val out = SparkEntry.queries("q_dedup_simhash")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        -> r.getAs[Int]("hamming").toLong).toMap
    assert(out((0L, 1L)) == 0L) // identical -> identical simhash
    assert(out.contains((0L, 2L)), s"near-dup not within hamming 8: $out")
  }

  test("q_dedup_ngram_jaccard agrees with minhash on the seeded pairs") {
    val out = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        -> r.getAs[Double]("jaccard")).toMap
    assert(out((0L, 1L)) == 1.0)
    assert(out((0L, 2L)) > 0.8)
  }

  test("q_dedup_containment dominates jaccard and finds the seeded pairs") {
    val cont = SparkEntry.queries("q_dedup_containment")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        -> r.getAs[Double]("containment")).toMap
    val jac = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        -> r.getAs[Double]("jaccard")).toMap
    assert(cont((0L, 1L)) == 1.0) // identical docs
    assert(cont((0L, 2L)) > 0.8)  // one-token edit
    // |A∩B|/min ≥ |A∩B|/union on every pair both surfaced
    jac.keys.filter(cont.contains).foreach { k =>
      assert(cont(k) >= jac(k) - 1e-4, s"containment < jaccard for $k")
    }
  }

  test("ngram jaccard refuses oversized blocks (quadratic guard)") {
    // with a 1-pair budget every fixture block is oversized — the
    // guard must raise and point at the scalable minhash path
    val e = intercept[Exception] {
      graft.operators.DedupQueries
        .ngramJaccardPairs(spark, sfDir, maxPairsPerBlock = 1L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("q_dedup_minhash")),
      s"guard did not fire or lost its message: $e")
    // and the default budget still returns the fixture pairs
    assert(graft.operators.DedupQueries
      .ngramJaccardPairs(spark, sfDir).count() >= 1)
  }

  test("cluster representative keeps the longest member, lowest id on " +
    "ties, and accounts every member exactly once") {
    val dir = Files.createTempDirectory("graft_clusterrep").toString
    val prefixA = "p1 p2 p3 p4 p5 p6 p7 p8"
    val prefixB = "q1 q2 q3 q4 q5 q6 q7 q8"
    def tail(w: String, n: Int) = Seq.fill(n)(w).mkString(" ")
    val docs = Seq(
      // cluster A: 11 is the longest -> keeper despite higher id
      (10L, s"$prefixA ${tail("aa", 5)}"),
      (11L, s"$prefixA ${tail("bb", 20)}"),
      (12L, s"$prefixA ${tail("cc", 2)}"),
      // cluster B: equal lengths -> min doc_id 20 wins the tie
      (20L, s"$prefixB ${tail("dd", 7)}"),
      (21L, s"$prefixB ${tail("ee", 7)}"),
      // singleton: its own representative, nothing reclaimed
      (30L, "r1 r2 r3 r4 r5 r6 r7 r8 r9"))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dedup_cluster_rep")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("rep_doc_id") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("total_chars"),
          r.getAs[Long]("chars_saved"))))
      .toMap
    val chars = docs.map { case (id, t) => id -> t.length.toLong }.toMap
    assert(out.keySet == Set(11L, 20L, 30L), s"representatives: $out")
    assert(out(11L)._1 == 3L && out(20L)._1 == 2L && out(30L)._1 == 1L)
    assert(out(11L)._2 == chars(10L) + chars(11L) + chars(12L))
    assert(out(11L)._3 == chars(10L) + chars(12L),
      "saved = every non-representative byte in the cluster")
    assert(out(20L)._3 == chars(21L))
    assert(out(30L)._3 == 0L, "singleton reclaims nothing")
    // members partition the corpus
    assert(out.values.map(_._1).sum == docs.size.toLong)
  }
}
