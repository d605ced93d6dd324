package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamSinks

/** foreachBatch + Trigger.AvailableNow: the incremental stream→lake
  * pattern. Two separate drains over one checkpoint must produce each
  * input row exactly once across the batch-addressed output dirs. */
class StreamSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  test("AvailableNow drains incrementally, batch-addressed, no dups") {
    implicit val ctx = spark.sqlContext
    val out = Files.createTempDirectory("sink_out").toString
    val ckpt = Files.createTempDirectory("sink_ckpt").toString
    val stream = MemoryStream[(Long, String)]

    stream.addData((1L, "a"), (2L, "b"))
    val q1 = StreamSinks.foreachBatchParquet(
      stream.toDF().toDF("id", "v"), out, ckpt)
    q1.awaitTermination()

    // second drain over the SAME checkpoint: only the new rows flow
    stream.addData((3L, "c"))
    val q2 = StreamSinks.foreachBatchParquet(
      stream.toDF().toDF("id", "v"), out, ckpt)
    q2.awaitTermination()

    val got = spark.read.option("basePath", out).parquet(out)
      .select($"id", $"v", $"batch")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Number](2).longValue))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")), s"got: ${got.toSeq}")
    // the second drain landed in a LATER batch dir than the first
    assert(got.last._3 > got.head._3)
  }

  test("streaming ingest dedups each micro-batch against the corpus") {
    implicit val ctx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("dsink_out").toString
    val ckpt = Files.createTempDirectory("dsink_ckpt").toString
    val corpusDoc = graft.sources.TableLoader.documents(spark, sfDir)
      .select($"doc_id", $"text").orderBy($"doc_id").limit(1)
      .collect()(0).getString(1)
    val novel = (1 to 60)
      .map(i => s"streamword$i fresh${i * 3} tok${i * 17}").mkString(" ")
    val stream = MemoryStream[(Long, String)]
    stream.addData(
      (50001L, corpusDoc), // exact corpus dup — dropped
      (50002L, novel), // novel — kept
      (50003L, novel)) // in-batch exact dup — dropped
    val q = StreamSinks.foreachBatchDedupParquet(
      stream.toDF().toDF("doc_id", "text"), sfDir, out, ckpt)
    q.awaitTermination()
    val kept = spark.read.option("basePath", out).parquet(out)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(50002L), s"survivors: $kept")
  }
}
