package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the retrieval-stack extensions (hybrid RRF,
  * MMR re-rank, JL random projection, preference pairs) — properties
  * the oracle hash can't see. */
class RetrievalExtSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q_hybrid_rrf: 20 rows, every doc ranked by at least one " +
    "retriever, scores bounded by the two-list RRF maximum") {
    val rows = run("q_hybrid_rrf").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val rLex = Option(r.get(1)).map(_.asInstanceOf[Long])
      val rVec = Option(r.get(2)).map(_.asInstanceOf[Long])
      assert(rLex.isDefined || rVec.isDefined, s"unranked doc: $r")
      rLex.foreach(x => assert(x >= 1 && x <= 100))
      rVec.foreach(x => assert(x >= 1 && x <= 100))
      val rrf = r.getDouble(3)
      // max possible: rank 1 in both lists = 2/61
      assert(rrf > 0 && rrf <= 2.0 / 61 + 1e-9, s"rrf out of range: $r")
    }
    // fused output must outrank either single list's tail: the top
    // fused doc appears in the top half of at least one list
    val top = rows.head
    val best = Seq(Option(top.get(1)), Option(top.get(2))).flatten
      .map(_.asInstanceOf[Long]).min
    assert(best <= 50, s"top fused doc poorly ranked everywhere: $top")
  }

  test("q_mmr_rerank: selection is a diverse subset of the candidate " +
    "pool — distinct ids, relevance-first seed, lower redundancy than " +
    "plain top-k") {
    val sel = run("q_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(sel.length == 10)
    assert(sel.map(_._2).distinct.length == 10, "duplicate selection")
    assert(sel.map(_._1).toSeq == (1L to 10L), "ranks not 1..10")
    // step 1 is the pure-relevance argmax: its mmr equals its relevance
    assert(sel.head._3 == sel.head._4, "seed not relevance-first")

    // redundancy check: avg pairwise cosine of the MMR selection must
    // not exceed that of the plain cosine top-10 (the entire point of
    // the (1-λ) penalty) — verified on raw vectors
    val e = graft.sources.TableLoader.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    def avgPairwise(ids: Seq[Long]): Double = {
      val ps = for {
        i <- ids.indices; j <- (i + 1) until ids.length
      } yield cos(e(ids(i)), e(ids(j)))
      ps.sum / ps.length
    }
    val q = e(0L)
    val top10 = e.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(10).map(_._1)
    val mmrIds = sel.map(_._2).toSeq
    assert(avgPairwise(mmrIds) <= avgPairwise(top10) + 1e-12,
      "MMR selection no more diverse than plain top-k")
    // and the pool containment: every selected id is in the top-20
    val top20 = e.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(20).map(_._1).toSet
    assert(mmrIds.forall(top20.contains), "selection outside pool")
  }

  test("q_random_projection: JL norm preservation — ratios " +
    "concentrate around 1, none degenerate") {
    val rows = run("q_random_projection").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 500)
    val ratios = rows.map(_._3)
    assert(ratios.forall(r => r > 0.3 && r < 2.0),
      s"degenerate ratio: ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.1,
      s"JL mean ratio drifted: $mean")
  }

  test("q_hard_negatives: 5 per probe, all wrong-label, and exactly " +
    "the brute-force top-5 hardest") {
    val rows = run("q_hard_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.size == 10 && byProbe.values.forall(_.length == 5))

    val e = graft.sources.TableLoader.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val labels = e.map(x => x._1 -> x._2).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    byProbe.foreach { case (probe, negs) =>
      negs.foreach { case (_, _, negId, negLabel, _) =>
        assert(labels(negId) == negLabel)
        assert(negLabel != labels(probe), "same-label negative")
      }
      // independent brute force: top-5 wrong-label by (round4 cos, id)
      val pv = e.find(_._1 == probe).get._3
      val brute = e.filter(_._2 != labels(probe))
        .map { case (id, _, v) => (id, r4(cos(v, pv))) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      assert(negs.sortBy(_._2).map(_._3).toSeq == brute,
        s"probe $probe selection differs from brute force")
    }
  }

  test("q_preference_pairs: chosen strictly beats rejected, pairs are " +
    "within-group, margin matches the quality gap") {
    val rows = run("q_preference_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (chosenId, rejectedId) = (r.getLong(2), r.getLong(3))
      val (cq, rq, margin) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(chosenId != rejectedId)
      assert(cq > rq, s"non-positive preference: $r")
      assert(math.abs(margin - BigDecimal(cq - rq)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // group keys unique: one pair per (source, lang)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
  }
}
