package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableLoader

/** Split/sampling operators: proportion sanity + reproducibility. */
class SamplingSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.session

  test("hash split lands near 90/5/5 and is content-stable") {
    val out = SparkEntry.queries("q_split_hash")(spark, sfDir)
    val n = out.count().toDouble
    val frac = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03, frac)
    assert(math.abs(frac("val") - 0.05) < 0.02, frac)
    assert(math.abs(frac("test") - 0.05) < 0.02, frac)
    // content-stable: same assignment regardless of row order
    val a = out.collect().toSeq
    val b = SparkEntry.queries("q_split_hash")(spark, sfDir)
      .collect().toSeq
    assert(a == b)
  }

  test("stratified sample is seeded-reproducible with sane proportions") {
    val s1 = SparkEntry.queries("q_sample_stratified")(spark, sfDir)
      .collect().toSeq
    val s2 = SparkEntry.queries("q_sample_stratified")(spark, sfDir)
      .collect().toSeq
    assert(s1 == s2, "sampleBy with fixed seed must reproduce")
    val total = TableLoader.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = s1.groupBy(_.getString(1)).view.mapValues(_.size).toMap
    assert(math.abs(sampled("en").toDouble / total("en") - 0.5) < 0.1)
    assert(math.abs(sampled("zh").toDouble / total("zh") - 0.1) < 0.06)
  }
}
