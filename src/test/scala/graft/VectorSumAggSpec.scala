package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorSumAgg

/** VectorSumAgg must reproduce EXACTLY what the posexplode +
  * groupBy(label, pos) aggregate it replaced produced (r14
  * optimization: q_embed_diversity's per-dimension corpus sums) —
  * element-wise integer sums and per-dimension row counts — including
  * on ragged inputs (vectors of different lengths in one group) and
  * null rows. Long addition is order-free, so equality is exact, not
  * approximate. */
class VectorSumAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  test("matches posexplode+groupBy sums/counts, incl. ragged + nulls") {
    val rng = new scala.util.Random(23)
    val rows: Seq[(String, Option[Seq[Long]])] = (0 until 300).map { i =>
      val label = s"l${i % 4}"
      if (i % 37 == 0) (label, None)
      else {
        val d = if (i % 11 == 0) 3 else 8 // ragged on purpose
        (label,
          Some(Seq.fill(d)(rng.nextInt(2000001).toLong - 1000000L)))
      }
    }
    val df = rows.toDF("label", "qv")
    val got = df.groupBy($"label")
      .agg(VectorSumAgg($"qv").as("vc"))
      .select($"label", $"vc.sums", $"vc.counts")
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Long](1).toList, r.getSeq[Long](2).toList))
      .toMap
    val ref = df
      .select($"label", posexplode($"qv").as(Seq("pos", "qx")))
      .groupBy($"label", $"pos")
      .agg(sum($"qx").as("s"), count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        val d = rs.map(_.getInt(1)).max + 1
        val s = new Array[Long](d)
        val c = new Array[Long](d)
        rs.foreach { r => s(r.getInt(1)) = r.getLong(2)
          c(r.getInt(1)) = r.getLong(3) }
        l -> (s.toList, c.toList)
      }
    assert(got.keySet === ref.keySet)
    ref.foreach { case (l, (s, c)) =>
      assert(got(l)._1 === s, s"sums of $l")
      assert(got(l)._2 === c, s"counts of $l")
    }
  }

  test("empty group (all-null input) yields empty arrays") {
    val out = Seq(("a", Option.empty[Seq[Long]]))
      .toDF("label", "qv")
      .groupBy($"label").agg(VectorSumAgg($"qv").as("vc"))
      .select($"vc.sums", $"vc.counts").collect()(0)
    assert(out.getSeq[Long](0).isEmpty && out.getSeq[Long](1).isEmpty)
  }
}
