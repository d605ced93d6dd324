package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_calibration_isotonic: the ML-fit PAV must agree EXACTLY with an
  * independent textbook pool-adjacent-violators implementation, be
  * monotone, and preserve the weighted mean. */
class IsotonicCalibrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.01"

  /** Textbook weighted PAV over (y, w) in feature order. */
  private def pav(ys: Array[Double], ws: Array[Double]): Array[Double] = {
    val vy = scala.collection.mutable.ArrayBuffer.empty[Double]
    val vw = scala.collection.mutable.ArrayBuffer.empty[Double]
    val cnt = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- ys.indices) {
      vy += ys(i) * ws(i); vw += ws(i); cnt += 1
      while (vy.length > 1 &&
        vy(vy.length - 2) / vw(vw.length - 2) > vy.last / vw.last) {
        val ly = vy.remove(vy.length - 1)
        val lw = vw.remove(vw.length - 1)
        val lc = cnt.remove(cnt.length - 1)
        vy(vy.length - 1) += ly
        vw(vw.length - 1) += lw
        cnt(cnt.length - 1) += lc
      }
    }
    vy.indices.iterator
      .flatMap(i => Iterator.fill(cnt(i))(vy(i) / vw(i))).toArray
  }

  private lazy val rows =
    SparkEntry.queries("q_calibration_isotonic")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n"),
        r.getAs[Double]("pos_rate"), r.getAs[Double]("iso_rate")))
      .sortBy(_._1)

  test("iso_rate equals an independent textbook PAV over the bins") {
    val expected = pav(
      rows.map(_._3), rows.map(_._2.toDouble))
    rows.map(_._4).zip(expected).zipWithIndex.foreach {
      case ((got, want), i) =>
        assert(math.abs(got - want) <= 5e-6, // inputs are 6dp-rounded
          s"bin $i: iso_rate $got vs PAV $want")
    }
  }

  test("calibrated rates are monotone non-decreasing in score") {
    val iso = rows.map(_._4)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b }, iso.toSeq)
  }

  test("pooling preserves the weighted mean") {
    val wSum = rows.map(_._2.toDouble).sum
    val rawMean = rows.map(r => r._2 * r._3).sum / wSum
    val isoMean = rows.map(r => r._2 * r._4).sum / wSum
    assert(math.abs(rawMean - isoMean) < 1e-5,
      s"PAV must not move the overall rate: $rawMean vs $isoMean")
  }
}
