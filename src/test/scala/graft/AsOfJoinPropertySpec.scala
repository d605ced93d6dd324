package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoinOps

/** Randomized model check for the native as-of operator: for seeded
  * random tables (hot keys, duplicate timestamps, keys absent from one
  * side, empty sides), both directions and random tolerances must
  * reproduce a 10-line reference model evaluated in plain Scala. The
  * Spark side runs the REAL pipeline (shuffle → sort → merge exec), so
  * partitioning and ordering corner cases are exercised, not mocked.
  */
class AsOfJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  /** reference model: latest (earliest for forward) right time per
    * left row, tolerance applied; payload ignored (the matched TIME is
    * the deterministic part of the contract). */
  private def model(
      left: Seq[(Long, Long)], right: Seq[(Long, Long)],
      fwd: Boolean, tol: Option[Long]): Map[(Long, Long, Int), Option[Long]] =
    left.zipWithIndex.map { case ((k, t), i) =>
      val cands = right.filter(_._1 == k).map(_._2)
        .filter(rt => if (fwd) rt >= t else rt <= t)
        .filter(rt => tol.forall(x =>
          if (fwd) rt - t <= x else t - rt <= x))
      (k, t, i) -> (if (cands.isEmpty) None
        else Some(if (fwd) cands.min else cands.max))
    }.toMap

  test("native as-of matches the reference model on 12 random tables " +
    "(both directions, random tolerances, skew, empties)") {
    for (seed <- 1 to 12) {
      val rng = new scala.util.Random(seed)
      val nKeys = 1 + rng.nextInt(5)
      val nL = rng.nextInt(40)
      val nR = rng.nextInt(40)
      // key 0 is hot on both sides; times collide often (mod 20)
      def key() = if (rng.nextBoolean()) 0L else rng.nextInt(nKeys).toLong
      val lRows = (0 until nL).map(_ => (key(), rng.nextInt(20).toLong))
      val rRows = (0 until nR).map(_ => (key(), rng.nextInt(20).toLong))
      val fwd = rng.nextBoolean()
      val tol = if (rng.nextBoolean()) None else Some(rng.nextInt(8).toLong)

      val lDf = lRows.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
        .toDF("k", "t", "rid")
      val rDf = rRows.toDF("k", "t")
      val got = AsOfJoinOps.asof(lDf, "t", rDf, "t",
          Seq("k"), Seq("k"), toleranceMicros = tol,
          direction = if (fwd) "forward" else "backward")
        .select(col("k"), col("t"), col("rid"), col("t_r"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

      val want = model(lRows, rRows, fwd, tol)
      assert(got == want,
        s"seed=$seed fwd=$fwd tol=$tol nL=$nL nR=$nR\n" +
          s"diff=${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
    }
  }
}
