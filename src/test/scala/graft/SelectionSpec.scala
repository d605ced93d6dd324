package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SelectionQueries

/** Data-selection operators: DSIR importance weights (directional
  * sanity — the hash-gated arithmetic is under the oracle) and
  * SemDeDup drop semantics on planted duplicate vectors. */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  import spark.implicits._

  test("DSIR weights separate target-vocabulary docs from off-target " +
    "docs, with mixed docs in between") {
    // the shipped fixtures use ONE vocabulary for every lang value, so
    // the directional property needs a corpus where the target really
    // differs: en docs draw from vocab A, others from disjoint vocab
    // B, one mixed doc draws from both
    val dir = Files.createTempDirectory("graft_dsir").toString
    val vocabA = Seq("alpha", "bravo", "charlie", "delta", "echo")
    val vocabB = Seq("zulu", "yankee", "xray", "whiskey", "victor")
    def doc(v: Seq[String], seed: Int, n: Int): String =
      (0 until n).map(j => v((seed * 31 + j * 7) % v.size)).mkString(" ")
    val docs =
      (0 until 20).map(i => (i.toLong, doc(vocabA, i, 40), "en", "s")) ++
      (20 until 40).map(i => (i.toLong, doc(vocabB, i, 40), "de", "s")) ++
      Seq((40L, doc(vocabA, 3, 20) + " " + doc(vocabB, 3, 20), "de", "s"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = SparkEntry.queries("q_dsir_weights")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        r.getDouble(2) / r.getAs[Long]("n_grams")).toMap
    val enAvg = (0 until 20).map(i => w(i.toLong))
    val deAvg = (20 until 40).map(i => w(i.toLong))
    // defining property of an importance weight toward the target:
    // every pure-target doc above every pure-off-target doc, the
    // mixed doc strictly between the two families
    assert(enAvg.min > deAvg.max,
      s"target/off-target not separated: en ${enAvg.min}, de ${deAvg.max}")
    assert(w(40L) > deAvg.max && w(40L) < enAvg.min,
      s"mixed doc ${w(40L)} not between families")
  }

  test("DSIR on the shipped corpus: a weight for every multi-token " +
    "doc, deterministic across runs") {
    val out = SparkEntry.queries("q_dsir_weights")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val nDocs = graft.sources.TableLoader.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.size.toLong == nDocs, s"${out.size} weights, $nDocs docs")
    val again = SparkEntry.queries("q_dsir_weights")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == again)
  }

  test("DSIR Gumbel-top-k sample: deterministic, weight-consistent, " +
    "key-ordered, without replacement") {
    val sample = SparkEntry.queries("q_dsir_sample")(spark, sfDir).collect()
    val again = SparkEntry.queries("q_dsir_sample")(spark, sfDir).collect()
    assert(sample.toSeq == again.toSeq, "sample not deterministic")
    val weights = SparkEntry.queries("q_dsir_weights")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sample.length == math.min(50, weights.size))
    // no doc drawn twice, every log_w is the scoring query's value
    val ids = sample.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "drawn with replacement")
    sample.foreach(r =>
      assert(r.getDouble(1) == weights(r.getLong(0)),
        s"log_w mismatch for doc ${r.getLong(0)}"))
    // keys non-increasing (ties broken by doc_id upstream)
    val keys = sample.map(_.getDouble(2))
    keys.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
  }

  test("Gopher rules flag each violation class and keep the clean doc") {
    val dir = Files.createTempDirectory("graft_gopher").toString
    val stops = "the a of and to"
    val good = (stops + " ") + Seq.fill(55)("word").mkString(" ")
    val tooShort = stops + " tiny doc"
    val longWords =
      (0 until 60).map(_ => "supercalifragilistic").mkString(" ")
    val nonAlpha = (0 until 60).map(i => s"$i$i$i").mkString(" ")
    val noStops = Seq.fill(60)("word").mkString(" ")
    val docs = Seq(
      (0L, good, "en", "s"), (1L, tooShort, "en", "s"),
      (2L, longWords, "en", "s"), (3L, nonAlpha, "en", "s"),
      (4L, noStops, "en", "s"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_gopher_rules")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = (out(id).getAs[Int]("ok_words"),
      out(id).getAs[Int]("ok_wlen"), out(id).getAs[Int]("ok_alpha"),
      out(id).getAs[Int]("ok_stop"), out(id).getAs[Int]("keep"))
    assert(flags(0L) == ((1, 1, 1, 1, 1)), s"clean doc rejected: ${out(0L)}")
    assert(flags(1L)._1 == 0 && flags(1L)._5 == 0, "short doc kept")
    assert(flags(2L)._2 == 0 && flags(2L)._5 == 0, "long-word doc kept")
    assert(flags(3L)._3 == 0 && flags(3L)._5 == 0, "non-alpha doc kept")
    assert(flags(4L)._4 == 0 && flags(4L)._5 == 0, "stop-free doc kept")
  }

  test("Gopher keep bit is exactly the conjunction of the four rule " +
    "flags on the shipped corpus") {
    val rows = SparkEntry.queries("q_gopher_rules")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conj = Seq("ok_words", "ok_wlen", "ok_alpha", "ok_stop")
        .map(r.getAs[Int](_)).min
      assert(r.getAs[Int]("keep") == conj, s"keep != conjunction: $r")
    }
  }

  test("embed diversity: collapsed label scores exactly 1, orthogonal " +
    "label exactly 0, zero vectors excluded") {
    val dir = Files.createTempDirectory("graft_diversity").toString
    // label 0: 30 identical one-hot vectors -> every pairwise cos = 1
    // label 1: 30 mutually-orthogonal one-hots -> every pairwise cos = 0
    // label 2: one vector (n=1, no pairs) + one all-zero vector -> no row
    val rows =
      (0 until 30).map(i => (i.toLong,
        Array.tabulate(64)(t => if (t == 0) 2.5f else 0.0f).toSeq, 0)) ++
      (0 until 30).map(i => (100L + i,
        Array.tabulate(64)(t => if (t == i) 1.0f else 0.0f).toSeq, 1)) ++
      Seq((200L, Array.tabulate(64)(t => 1.0f).toSeq, 2),
        (201L, Array.fill(64)(0.0f).toSeq, 2))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_embed_diversity")(spark, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(0, 1), s"labels: ${out.keySet}")
    assert(out(0) == ((30L, 1.0)), s"collapsed label: ${out(0)}")
    assert(out(1) == ((30L, 0.0)), s"orthogonal label: ${out(1)}")
  }

  test("SemDeDup drops exactly the planted duplicate vectors, keeping " +
    "the lowest-id canonical") {
    val dir = Files.createTempDirectory("graft_semdedup").toString
    // 50 mutually-orthogonal base vectors (one-hot dims 0..49) and 20
    // EXACT copies of the first 20 (ids 1000+k): cosine(copy, base)=1,
    // cosine(any other pair)=0 — the drop set is knowable in advance
    val base = (0 until 50).map { k =>
      (k.toLong, Array.tabulate(64)(t => if (t == k) 1.0f else 0.0f).toSeq,
        k % 10)
    }
    val copies = (0 until 20).map { k =>
      (1000L + k, Array.tabulate(64)(t => if (t == k) 1.0f else 0.0f).toSeq,
        k % 10)
    }
    (base ++ copies).toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val drops = SelectionQueries.semdedupDrops(spark, dir, tau = 0.95)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("kept_id"))
      .toMap
    assert(drops.keySet == (0 until 20).map(k => 1000L + k).toSet,
      s"drop set wrong: $drops")
    (0 until 20).foreach(k =>
      assert(drops(1000L + k) == k.toLong,
        s"copy ${1000 + k} kept ${drops(1000L + k)}, expected $k"))
    // the per-cluster report is |clusters| rows and accounts for
    // every drop exactly once
    val report = SparkEntry.queries("q_semdedup")(spark, dir).collect()
    assert(report.map(_.getAs[Long]("n_vecs")).sum == 70L)
    assert(report.map(_.getAs[Long]("n_dropped")).sum == 20L)
  }

  test("UniMax waterfilling matches the closed-form allocation: small " +
    "languages capped at E epochs, the rest split the remainder") {
    // lang word totals 2/3/40/155, budget B = 200/2 = 100, E = 4:
    //   asc order (aa, bb, cc, dd) →
    //   aa: share 100/4 = 25,   4·2  = 8  ≤ 25 → capped 8
    //   bb: share 92/3 ≈ 30.7,  4·3  = 12 ≤    → capped 12
    //   cc: share 80/2 = 40,    4·40 = 160 >   → uncapped, share 40
    //   dd: uncapped, same share 40          (8+12+40+40 = 100 = B)
    val dir = Files.createTempDirectory("graft_unimax").toString
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    Seq(
      (1L, doc(2), "aa"), (2L, doc(3), "bb"),
      (3L, doc(25), "cc"), (4L, doc(15), "cc"),
      (5L, doc(100), "dd"), (6L, doc(55), "dd"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_unimax_alloc")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("alloc_tokens"),
          r.getAs[Int]("capped"))))
      .toMap
    assert(out("aa") == ((2L, 8.0, 1)), s"aa: ${out("aa")}")
    assert(out("bb") == ((3L, 12.0, 1)), s"bb: ${out("bb")}")
    assert(out("cc") == ((40L, 40.0, 0)), s"cc: ${out("cc")}")
    assert(out("dd") == ((155L, 40.0, 0)), s"dd: ${out("dd")}")
  }

  test("UniMax degenerates to an equal split when even the smallest " +
    "language exceeds its fair share") {
    // totals 25/175 → B = 100, E = 4: the SMALLEST language already
    // wants 4·25 = 100 > its fair share 100/2 = 50, so the uncapped
    // suffix starts at i = 1 and every language gets the equal share
    // 50 — the pivot-at-first-index branch (k = 1, no capped prefix)
    val dir = Files.createTempDirectory("graft_unimax2").toString
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    Seq((1L, doc(25), "aa"), (2L, doc(175), "bb"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_unimax_alloc")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Double]("alloc_tokens"), r.getAs[Int]("capped"))))
      .toMap
    assert(out("aa") == ((50.0, 0)), s"aa: ${out("aa")}")
    assert(out("bb") == ((50.0, 0)), s"bb: ${out("bb")}")
  }

  test("data-constrained yield: sub-epoch languages yield exactly " +
    "their read tokens, repeated languages saturate per the decay law") {
    // reuse the UniMax fixture: totals 2/3/40/155, B = 100, E = 4 →
    // alloc aa=8 (4 epochs), bb=12 (4 epochs), cc=40 (1 epoch),
    // dd=40 (40/155 < 1 epoch)
    val dir = Files.createTempDirectory("graft_datacon").toString
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    Seq(
      (1L, doc(2), "aa"), (2L, doc(3), "bb"),
      (3L, doc(25), "cc"), (4L, doc(15), "cc"),
      (5L, doc(100), "dd"), (6L, doc(55), "dd"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_data_constrained")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Double]("epochs"), r.getAs[Double]("eff_tokens"))))
      .toMap
    // closed form: U + U·15·(1 − e^{−(R−1)/15}) for R epochs of U
    def eff(u: Double, r: Double): Double =
      u * (1 + 15.0 * (1 - math.floor(
        math.exp(-(r - 1) / 15.0) * 1e6) / 1e6))
    assert(out("aa")._1 == 4.0 && out("bb")._1 == 4.0)
    assert(math.abs(out("aa")._2 - eff(2, 4)) < 1e-3, s"aa: ${out("aa")}")
    assert(math.abs(out("bb")._2 - eff(3, 4)) < 1e-3, s"bb: ${out("bb")}")
    // exactly one epoch: both branches equal U (continuity point)
    assert(out("cc") == ((1.0, 40.0)), s"cc: ${out("cc")}")
    // under one epoch: yield is the tokens actually read, not U
    assert(out("dd")._1 < 1.0 && out("dd")._2 == 40.0, s"dd: ${out("dd")}")
    // repetition decays: 4 epochs yield strictly less than 4× uniques
    assert(out("aa")._2 < 4 * 2.0 && out("aa")._2 > 2.0)
  }

  test("CCNet buckets partition the corpus into ordered terciles " +
    "by KN fluency") {
    val out = SparkEntry.queries("q_ccnet_buckets")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("avg_nll"))))
      .toMap
    assert(out.keySet == Set("head", "middle", "tail"), s"$out")
    // every doc with ≥ 2 whitespace tokens gets a KN score
    val scoredDocs = graft.sources.TableLoader.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.values.map(_._1).sum == scoredDocs,
      "buckets must partition every scored doc")
    // value-cut terciles: each bucket holds ≥ 1 doc and the head is
    // at most ⌈n/3⌉ + ties; mean NLL must be strictly ordered
    assert(out("head")._2 < out("middle")._2)
    assert(out("middle")._2 < out("tail")._2)
    assert(out("head")._1 >= (scoredDocs + 2) / 3,
      "head must reach the first tercile rank (ties may overshoot)")
  }

  test("SemDeDup drop rows pair cos with kept_id, not the max over " +
    "qualifying neighbors") {
    val dir = Files.createTempDirectory("graft_semcos").toString
    // three coplanar unit vectors at 0°, 8°, 12° in span(e0, e1):
    // v5's qualifying lower-id neighbors are v1 (cos 12° ≈ 0.978) and
    // v3 (cos 4° ≈ 0.9976); kept_id = min = 1, and the audit contract
    // requires cos = cos(v5, v1) — a max-over-group would report
    // 0.9976, the similarity with a DIFFERENT vector
    def planar(theta: Double): Seq[Float] = {
      val c = math.cos(theta).toFloat
      val sn = math.sin(theta).toFloat
      Array.tabulate(64)(t =>
        if (t == 0) c else if (t == 1) sn else 0.0f).toSeq
    }
    val rad = math.Pi / 180
    val close = Seq(
      (1L, planar(0.0), 0), (3L, planar(8 * rad), 0),
      (5L, planar(12 * rad), 0))
    val far = (0 until 40).map(i => (100L + i,
      Array.tabulate(64)(t => if (t == 10 + i) 1.0f else 0.0f).toSeq, 1))
    (close ++ far).toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val drops = SelectionQueries.semdedupDrops(spark, dir, tau = 0.95)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("kept_id"), r.getAs[Double]("cos"))))
      .toMap
    assert(drops.keySet == Set(3L, 5L), s"drop set: $drops")
    assert(drops(3L)._1 == 1L)
    assert(math.abs(drops(3L)._2 - math.cos(8 * rad)) < 1e-3)
    assert(drops(5L)._1 == 1L)
    assert(math.abs(drops(5L)._2 - math.cos(12 * rad)) < 1e-3,
      s"cos must pair with kept_id=1 (cos 12°), got ${drops(5L)._2}")
  }

  test("DoReMi upweights the high-excess-loss domain and clamps the " +
    "fluent domain at its baseline share") {
    // source 'rep': every doc is the SAME two-token alternation, so
    // its bigrams dominate the corpus LM -> per-bigram NLL below the
    // corpus mean -> excess clamps to 0 and weight/share stays at the
    // e^0 floor. source 'div': every doc uses doc-unique tokens, so
    // every bigram is a count-1 singleton -> NLL above the mean ->
    // positive excess -> EG upweights it relative to its share.
    val dir = Files.createTempDirectory("graft_doremi").toString
    def rep(n: Int) = Seq.fill(n)("aa bb").mkString(" ")
    def div(seed: Int, n: Int) =
      (0 until n).map(j => s"w${seed}x$j").mkString(" ")
    val docs =
      (0 until 10).map(i => (i.toLong, rep(20), "en", "rep")) ++
      (10 until 20).map(i => (i.toLong, div(i, 40), "en", "div"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_doremi_weights")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("token_share"), r.getAs[Double]("excess_nll"),
          r.getAs[Double]("weight"))))
      .toMap
    assert(out.keySet == Set("rep", "div"), s"sources: ${out.keySet}")
    assert(out("rep")._2 == 0.0,
      s"fluent domain must clamp at zero excess: ${out("rep")}")
    assert(out("div")._2 > 0.0, s"diverse domain excess: ${out("div")}")
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-4,
      "weights must normalize")
    // the EG step moves mass toward the high-excess domain
    assert(out("div")._3 > out("div")._1,
      s"div not upweighted vs baseline: ${out("div")}")
    assert(out("rep")._3 < out("rep")._1,
      s"rep not downweighted vs baseline: ${out("rep")}")
  }

  test("DoReMi on the shipped corpus: every source weighted, " +
    "non-negative excess, normalized, deterministic") {
    val rows = SparkEntry.queries("q_doremi_weights")(spark, sfDir)
      .collect()
    assert(rows.length == 20, s"${rows.length} sources")
    rows.foreach { r =>
      assert(r.getAs[Double]("excess_nll") >= 0.0, s"negative excess: $r")
      assert(r.getAs[Double]("weight") > 0.0, s"zero weight: $r")
    }
    assert(math.abs(
      rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-4)
    // at least one source sits at or below the reference NLL
    assert(rows.exists(_.getAs[Double]("excess_nll") == 0.0),
      "some source must clamp at the corpus reference")
    val again = SparkEntry.queries("q_doremi_weights")(spark, sfDir)
      .collect()
    assert(rows.toSeq == again.toSeq, "not deterministic")
  }

  test("SemDeDup per-cluster pair budget raises with a diagnostic " +
    "pointing at the banded path") {
    // an oversize cluster is simulated by the budget math itself:
    // 2001² > 4e6 would raise — here we assert the real corpora stay
    // under budget AND the guard text is wired (fire it via a corpus
    // that k-means collapses into one cluster: 2001 identical vectors
    // would blow the 4e6 budget only at 2001² = 4.004e6)
    val dir = Files.createTempDirectory("graft_sembudget").toString
    (0 until 2001).map(i =>
      (i.toLong, Array.tabulate(64)(t => if (t == 0) 1.0f else 0.0f).toSeq,
        0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      SelectionQueries.semdedupDrops(spark, dir).collect()
    }
    assert(e.getMessage.contains("q_dedup_embedding_lsh"),
      s"guard diagnostic missing: ${e.getMessage}")
  }

  test("SemDeDup budget guard still fires where the old n*n form " +
    "wrapped negative (overflow-disarm regression)") {
    // 3.1e9² ≈ 9.6e18 > Long.MaxValue: the former `n * n <= pairs`
    // guard went negative here and passed vacuously — exactly the
    // 100 TB cluster-size regime. The √budget form must still raise.
    val n = 3100000000L
    assert(n * n < 0L, "fixture must sit in the Long-overflow regime")
    val e = intercept[IllegalArgumentException] {
      SelectionQueries.requireClusterWithinSemBudget(n)
    }
    assert(e.getMessage.contains("3100000000"), e.getMessage)
    // and the boundary itself: 2000 passes, 2001 raises
    SelectionQueries.requireClusterWithinSemBudget(2000L)
    intercept[IllegalArgumentException] {
      SelectionQueries.requireClusterWithinSemBudget(2001L)
    }
  }
}
