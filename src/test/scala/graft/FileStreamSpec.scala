package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableLoader
import graft.streaming.StreamOps

/** Production-shaped streaming source: `readStream` over a parquet
  * directory (the lake-tailing pattern), driving the same StreamOps
  * builder as batch (SURVEY.md §3.4). */
class FileStreamSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  test("readStream over parquet matches the batch tumbling aggregate") {
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val batchEvents = TableLoader.events(spark, sfDir)
      .select(col("ts"), col("event_type"), col("value"))
    batchEvents.write.mode("overwrite").parquet(dir)
    val schema = batchEvents.schema
    val streamed = StreamOps.tumblingCounts(
      spark.readStream.schema(schema).parquet(dir))
    val q = streamed.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory").queryName("file_stream_out").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("file_stream_out")
      .orderBy(col("w"), col("event_type")).collect().toSeq
    val want = StreamOps.tumblingCounts(batchEvents)
      .orderBy(col("w"), col("event_type")).collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
