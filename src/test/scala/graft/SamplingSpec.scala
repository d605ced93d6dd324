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
    // content-stable: recompute the assignment from a shuffled copy of
    // the table (different row order/partitioning) — per-doc splits
    // must be identical because they derive from content, not position
    val a = out.collect().toSeq
    val shuffled = TableLoader.documents(spark, sfDir)
      .repartition(7, col("lang"))
      .sortWithinPartitions(col("n_chars"))
    val bucket =
      (conv(substring(md5(col("text").cast("binary")), 1, 4), 16, 10)
        .cast("int") % 100).cast("int")
    val b = shuffled
      .select(
        col("doc_id"), bucket.as("bucket"),
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(a == b)
  }

  test("stratified sample is key-deterministic with sane proportions; " +
    "the seeded sampleBy surface reproduces under a fixed seed") {
    val s1 = SparkEntry.queries("q_sample_stratified")(spark, sfDir)
      .collect().toSeq
    val s2 = SparkEntry.queries("q_sample_stratified")(spark, sfDir)
      .collect().toSeq
    assert(s1 == s2, "key-deterministic sample must reproduce exactly")
    // membership is a pure function of doc_id: a REPARTITIONED rerun
    // must agree row-for-row (the property seeded Bernoulli lacks)
    val s3 = graft.operators.SamplingQueries.qSampleStratified
      .fn(spark, sfDir).repartition(7).orderBy("doc_id").collect().toSeq
    assert(s1 == s3, "sample must not depend on partitioning")
    val b1 = graft.operators.SamplingQueries.sampleByLang(spark, sfDir)
      .collect().toSeq
    val b2 = graft.operators.SamplingQueries.sampleByLang(spark, sfDir)
      .collect().toSeq
    assert(b1 == b2, "sampleBy with fixed seed must reproduce")
    val total = TableLoader.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = s1.groupBy(_.getString(1)).view.mapValues(_.size).toMap
      .withDefaultValue(0)
    assert(math.abs(sampled("en").toDouble / total("en") - 0.5) < 0.1,
      s"en: ${sampled("en")} of ${total("en")}")
    assert(math.abs(sampled("zh").toDouble / total("zh") - 0.1) < 0.06,
      s"zh: ${sampled("zh")} of ${total("zh")}")
  }
}
