package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataOpsQueries, ExperimentQueries}

/** Property tests for the two-level prefix-sum shard packer on random
  * inputs: sparse/dense doc_id spaces, wildly varying token lengths,
  * docs bigger than the whole budget — shapes the fixture can't show.
  * The oracle-checked q_shard_pack pins the fixture; this pins the
  * algorithm. */
class DataOpsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  test("shardPack == sequential packing on random corpora") {
    val rng = new scala.util.Random(0x5eedL)
    for (trial <- 1 to 8) {
      val budget = Seq(50L, 500L, 5000L)(trial % 3)
      val n = 50 + rng.nextInt(400)
      // sparse, shuffled doc_id space (ids up to 10x count), token
      // counts spanning 0 to 3x budget (a doc can exceed the budget)
      val ids = rng.shuffle((0 until n * 10).toList).take(n)
      val docs = ids.map { id =>
        val t = rng.nextInt(3) match {
          case 0 => rng.nextInt(5).toLong
          case 1 => rng.nextInt(200).toLong
          case _ => rng.nextInt((3 * budget).toInt).toLong
        }
        (id.toLong, t)
      }
      val out = DataOpsQueries
        .shardPack(docs.toDF("doc_id", "toks"), budget)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      // sequential reference packing
      var off = 0L
      val direct = docs.sortBy(_._1).map { case (id, t) =>
        val shard = off / budget
        off += t
        (shard, id, t)
      }.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, ds) =>
        (s, ds.size.toLong, ds.map(_._3).sum,
          ds.map(_._2).min, ds.map(_._2).max)
      }
      assert(out.toSeq == direct, s"trial $trial budget $budget")
      // invariants: shards ascending, doc ranges contiguous and
      // non-overlapping, token totals conserved
      assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted)
      out.sliding(2).foreach {
        case Array(a, b) => assert(a._5 < b._4, s"trial $trial overlap")
        case _           =>
      }
      assert(out.map(_._3).sum == docs.map(_._2).sum)
      assert(out.map(_._2).sum == n.toLong)
    }
  }

  test("shardPack: a shard exceeds budget only via its last doc") {
    val rng = new scala.util.Random(7L)
    val docs = (0 until 200).map(i =>
      (i.toLong, (1 + rng.nextInt(400)).toLong))
    val budget = 1000L
    val out = DataOpsQueries
      .shardPack(docs.toDF("doc_id", "toks"), budget)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // start-offset packing: all but the final doc of a shard start
    // inside the budget, so shard_tokens < budget + max single doc
    val maxDoc = docs.map(_._2).max
    out.foreach { case (s, t) =>
      assert(t < budget + maxDoc, s"shard $s holds $t tokens")
    }
  }

  test("growthAccounting == per-user replay on random activity") {
    val rng = new scala.util.Random(0x60071L)
    for (trial <- 1 to 6) {
      val nUsers = 20 + rng.nextInt(60)
      val span = 10 + rng.nextInt(20)
      // random sparse activity; some users active once, some daily
      val actives = (1 to nUsers).flatMap { u =>
        val k = 1 + rng.nextInt(8)
        rng.shuffle((0 until span).toList).take(k)
          .map(d => (u.toLong, java.sql.Date.valueOf(
            java.time.LocalDate.of(2024, 3, 1).plusDays(d))))
      }.distinct
      val df = actives.toDF("user_id", "day")
      val out = ExperimentQueries.growthAccounting(df)
        .collect()
        .map(r => r.getDate(0).toLocalDate ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      // sequential replay
      val byUser = actives.groupBy(_._1)
        .map { case (u, xs) =>
          u -> xs.map(_._2.toLocalDate).sortBy(_.toEpochDay)
        }
      val maxD = actives.map(_._2.toLocalDate).maxBy(_.toEpochDay)
      var m = Map.empty[java.time.LocalDate, (Long, Long, Long, Long)]
      def add(d: java.time.LocalDate, i: Int): Unit = {
        val cur = m.getOrElse(d, (0L, 0L, 0L, 0L))
        m = m.updated(d, i match {
          case 0 => (cur._1 + 1, cur._2, cur._3, cur._4)
          case 1 => (cur._1, cur._2 + 1, cur._3, cur._4)
          case 2 => (cur._1, cur._2, cur._3 + 1, cur._4)
          case _ => (cur._1, cur._2, cur._3, cur._4 + 1)
        })
      }
      byUser.values.foreach { ds =>
        ds.zipWithIndex.foreach { case (d, i) =>
          if (i == 0) add(d, 0)
          else if (ds(i - 1).plusDays(1) == d) add(d, 1)
          else add(d, 2)
          val next = if (i + 1 < ds.size) Some(ds(i + 1)) else None
          if (d.isBefore(maxD) &&
              next.forall(_.isAfter(d.plusDays(1))))
            add(d.plusDays(1), 3)
        }
      }
      assert(out == m, s"trial $trial")
      // conservation: dau(d) = new + retained + resurrected
      actives.groupBy(_._2.toLocalDate).foreach { case (d, xs) =>
        val (nw, rt, rs, _) = out(d)
        assert(nw + rt + rs == xs.size, s"trial $trial day $d")
      }
    }
  }
}
