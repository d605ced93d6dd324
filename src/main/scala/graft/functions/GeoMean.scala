package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Geometric mean as a typed [[Aggregator]] — the canonical custom-UDAF
  * surface (SURVEY.md §2.4 q_agg_udaf_geomean).
  *
  * Buffer is (sum of logs, count): associative + commutative, so Spark
  * runs it partial/final like any built-in aggregate — at 100 TB each
  * task reduces locally and only 16 bytes per group cross the shuffle.
  * Non-positive inputs are ignored (log undefined), nulls skipped.
  */
object GeoMean extends Aggregator[java.lang.Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), a: java.lang.Double): (Double, Long) =
    if (a == null || a <= 0.0) b else (b._1 + math.log(a), b._2 + 1L)

  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `geo_mean($"x")`. */
  def apply(c: Column): Column = udaf(GeoMean).apply(c)
}
